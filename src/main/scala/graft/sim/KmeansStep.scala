package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One distributed Lloyd (k-means) iteration over the embedding
  * corpus — the cluster-side primitive behind IVF cell training
  * ([[Knn.buildIvfStore]] fits on a driver-side sample; THIS is the
  * shape you run when the corpus itself must vote, e.g. re-fitting
  * cells after a large ingest).
  *
  * Scale shape at 100 TB: the k seed centroids broadcast (k×d
  * numbers); assignment fans the corpus scan k-ways but collapses it
  * back MAP-SIDE — the argmin is a `min(struct(dist, cid, vq))`
  * hash-aggregate whose partial combine runs before any exchange, so
  * the shuffle carries n rows, never n×k (a window argmin would ship
  * the full fan-out). The mean recompute is a partial-aggregated
  * groupBy on (cluster, dim) whose shuffle carries k×d×partitions
  * partial sums, not vectors. No driver materialization beyond the
  * seed row set.
  *
  * Exactness: floats are quantized to integer 1e-3-ish units
  * (floor(x·1024)) BEFORE any arithmetic, so distances and mean
  * numerators are BIGINT sums — associative, order-free, and
  * bit-identical in any engine (the [[graft.text.TextRank]]
  * quantization precedent). Seeds are the first k vectors by vec_id;
  * argmin ties break on centroid id.
  */
object KmeansStep {

  private val Q = 1024L

  /** One assignment + mean-update step with `k` seed centroids.
    * Returns (cluster_id, dim, n_members, mean_q) — the updated
    * centroid table in quantized units. */
  def step(emb: DataFrame, k: Int): DataFrame = {
    graft.functions.VecDotLong.register(emb.sparkSession)
    val q = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(x * $Q) AS BIGINT))").as("vq"))
    val cents = q.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("vq").as("cq"))
    // struct ordering = (dist, cid, vq): (dist, cid) is already unique
    // per vec (cid is a vec_id), so vq rides along without ever
    // deciding the min — it just survives to the next stage
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("dist", expr("vec_sqdist_long(vq, cq)"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"), col("vq"))).as("m"))
    assigned
      .select(col("m.cid").as("cluster_id"),
        posexplode(col("m.vq")).as(Seq("dim", "xq")))
      .groupBy(col("cluster_id"), col("dim"))
      .agg(count(lit(1)).as("n_members"),
        (sum(col("xq")).cast("double") /
          count(lit(1)).cast("double")).as("mean_q"))
  }

  /** Full fixed-iteration Lloyd training: `iters` assignment+update
    * rounds with the centroid table fed back in QUANTIZED units, so
    * every iteration stays integer-exact end to end (cq' =
    * floor(Σxq/n) — one IEEE divide of bounded ints, engine-identical
    * floor). Same per-iteration scale shape as [[step]]: broadcast
    * centroids, map-side argmin collapse, (cluster, dim) partial-sum
    * update whose shuffle carries k×d×partitions numbers. Iteration
    * count is FIXED (the deterministic-gate discipline — convergence
    * tests would couple control flow to float comparisons); clusters
    * that lose all members drop out, identically in both engines.
    * Returns the final (cluster_id, dim, n_members, cq) table. */
  def train(emb: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    graft.functions.VecDotLong.register(emb.sparkSession)
    val q = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(x * $Q) AS BIGINT))").as("vq"))
      // the working set every Lloyd pass reads — materialize the
      // quantization once instead of re-scanning + re-quantizing the
      // source per iteration (censused: 4 embeddings scans at iters=3)
      .localCheckpoint(true)
    var cents = q.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("vq").as("cq"))
      // k rows; truncated per iteration below (LogregGd pattern) so
      // iteration i's broadcast doesn't re-embed iterations 1..i-1
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val assigned = q.crossJoin(broadcast(cents))
        .withColumn("dist", expr("vec_sqdist_long(vq, cq)"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"), col("vq"))).as("m"))
      // floor-quantized mean per (cluster, dim), then the per-cluster
      // centroid ARRAY reassembled dim-sorted (struct sort on the
      // leading int is total → deterministic array order)
      cents = assigned
        .select(col("m.cid").as("cid"), posexplode(col("m.vq")).as(Seq("dim", "xq")))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"),
          floor(sum(col("xq")).cast("double") / count(lit(1)).cast("double"))
            .cast("long").as("cqv"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, cqv))), s -> s.cqv)")
          .as("cq"), max(col("n")).as("n_members"))
        .select(col("cid"), col("cq"), col("n_members"))
        .localCheckpoint(true)
    }
    cents
      .select(col("cid").as("cluster_id"), col("n_members"),
        posexplode(col("cq")).as(Seq("dim", "cq")))
      .select(col("cluster_id"), col("dim"), col("n_members"), col("cq"))
  }

  /** DuckDB mirror of [[train]]: one CTE pair per iteration with the
    * identical seed rule, integer distances, tie-break, floor-mean
    * feedback, and list reassembly ordered by dim. */
  /** The shared CTE chain (`q`, `c0`..`c$iters`) behind [[trainSql]] —
    * exposed so composed oracles (SemDedup) reuse the exact same
    * training spelling and only add their own stages after it. */
  private[sim] def trainCtes(k: Int, iters: Int, dims: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""d$i AS (
         |  SELECT q.vec_id, c.cid,
         |    CAST(sum((q.vq[CAST(g.i AS INT)] - c.cq[CAST(g.i AS INT)]) *
         |             (q.vq[CAST(g.i AS INT)] - c.cq[CAST(g.i AS INT)]))
         |      AS BIGINT) AS dist
         |  FROM q, c${i - 1} c, unnest(generate_series(1, $dims)) g(i)
         |  GROUP BY 1, 2),
         |a$i AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d$i) z
         |  WHERE rn = 1),
         |m$i AS (
         |  SELECT a.cid, CAST(g.i - 1 AS INT) AS dim,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(floor(CAST(CAST(sum(q.vq[CAST(g.i AS INT)]) AS BIGINT) AS DOUBLE) /
         |      CAST(count(*) AS DOUBLE)) AS BIGINT) AS cqv
         |  FROM a$i a JOIN q USING (vec_id),
         |    unnest(generate_series(1, $dims)) g(i)
         |  GROUP BY 1, 2),
         |c$i AS (
         |  SELECT cid, list(cqv ORDER BY dim) AS cq, max(n) AS n_members
         |  FROM m$i GROUP BY cid)""".stripMargin
    }
    s"""q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(x * $Q) AS BIGINT)) AS vq
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, vq AS cq FROM q ORDER BY vec_id LIMIT $k),
       |${steps.mkString(",\n")}""".stripMargin
  }

  def trainSql(k: Int, iters: Int = 3, dims: Int = 64): String =
    s"""WITH ${trainCtes(k, iters, dims)}
       |SELECT cid AS cluster_id, CAST(g.i - 1 AS INT) AS dim, n_members,
       |  cq[CAST(g.i AS INT)] AS cq
       |FROM c$iters, unnest(generate_series(1, $dims)) g(i)""".stripMargin

  /** The quantization constant, shared with composed ops. */
  private[sim] def quant: Long = Q

  /** DuckDB oracle: identical quantization, seed rule, integer
    * distances, tie-break, and mean arithmetic (`dims` must match the
    * table's embedding width). */
  def stepSql(k: Int, dims: Int = 64): String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(x * $Q) AS BIGINT)) AS vq
       |  FROM embeddings),
       |c AS (SELECT vec_id AS cid, vq AS cq FROM q ORDER BY vec_id LIMIT $k),
       |dd AS (
       |  SELECT q.vec_id, c.cid,
       |    (q.vq[CAST(i AS INT)] - c.cq[CAST(i AS INT)]) AS dv
       |  FROM q, c, unnest(generate_series(1, $dims)) g(i)),
       |d AS (
       |  SELECT vec_id, cid, CAST(sum(dv * dv) AS BIGINT) AS dist
       |  FROM dd GROUP BY 1, 2),
       |a AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d) z
       |  WHERE rn = 1),
       |m AS (
       |  SELECT a.cid AS cluster_id, CAST(i - 1 AS INT) AS dim,
       |    q.vq[CAST(i AS INT)] AS xq
       |  FROM a JOIN q USING (vec_id),
       |    unnest(generate_series(1, $dims)) g(i))
       |SELECT cluster_id, dim,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS mean_q
       |FROM m GROUP BY 1, 2""".stripMargin
}
