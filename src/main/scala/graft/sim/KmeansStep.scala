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
    val q = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(x * $Q) AS BIGINT))").as("vq"))
    val cents = q.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("vq").as("cq"))
    // struct ordering = (dist, cid, vq): (dist, cid) is already unique
    // per vec (cid is a vec_id), so vq rides along without ever
    // deciding the min — it just survives to the next stage
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("dist", expr(
        "aggregate(zip_with(vq, cq, (x, c) -> (x - c) * (x - c)), " +
          "CAST(0 AS BIGINT), (a, v) -> a + v)"))
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
