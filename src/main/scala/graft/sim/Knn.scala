package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  * Brute-force top-k is the exact baseline: broadcast the (small) query
  * set against the full candidate table — scales linearly in corpus
  * size with no shuffle of the big side, the right shape for "score a
  * handful of probes against 100 TB of vectors".
  *
  * The dot product stays in whole-stage codegen via the higher-order
  * functions zip_with + aggregate; ranking uses a value rounded to 6
  * decimals with a doc-id tiebreak so results are reproducible across
  * engines (floats summed in a fixed left-to-right order).
  */
object Knn extends Serializable {

  /** Dot product of the qe/ne array<float> columns, accumulated in
    * double, left-to-right — the native codegen'd
    * [[graft.functions.VecDotFloat]] expression (bit-identical to the
    * zip_with+aggregate fold it replaced). Embeddings here are
    * unit-normalized, so this is cosine similarity. */
  val dotExpr: String = "vec_dot(qe, ne)"

  /** Exact top-k neighbors for query vectors (vec_id < numQueries). */
  def bruteForceTopK(emb: DataFrame, numQueries: Int, k: Int): DataFrame = {
    graft.functions.VecDotFloat.register(emb.sparkSession)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(expr(dotExpr), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** DuckDB mirror of [[bruteForceTopK]]. */
  def bruteForceTopKSql(numQueries: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |           FROM embeddings WHERE vec_id < $numQueries),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne
       |      FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    ROUND(list_dot_product(qe, ne), 6) AS cosine
       |  FROM q, c WHERE query_id <> neighbor_id)
       |SELECT query_id, neighbor_id, cosine, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $k""".stripMargin

  /** Hard-negative mining — the contrastive-training data op (SimCLR/
    * DPR-style): for each anchor vector, the `k` most-similar vectors
    * whose LABEL differs (the negatives the model is most likely to
    * confuse; random negatives are too easy to carry gradient). Same
    * broadcast-anchors × candidates shape as [[bruteForceTopK]] with
    * the label-mismatch predicate pushed into the join, so the per-
    * anchor window never sees in-class rows. The brute scan is the
    * witness; at corpus scale the candidate side routes through the
    * IVF/LSH stores exactly as for plain kNN (hard negatives are a
    * top-k over the same similarity — every ANN path applies).
    *
    * @return (query_id, anchor_label, neighbor_id, neighbor_label,
    *         cosine, rnk) — `k` hardest negatives per anchor. */
  def hardNegatives(emb: DataFrame, numQueries: Int, k: Int): DataFrame = {
    graft.functions.VecDotFloat.register(emb.sparkSession)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("anchor_label"),
        col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      col("label").as("neighbor_label"), col("embedding").as("ne"))
    val scored = c.join(broadcast(q),
        col("anchor_label") =!= col("neighbor_label"))
      .withColumn("cosine", round(expr(dotExpr), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("anchor_label"), col("neighbor_id"),
        col("neighbor_label"), col("cosine"), col("rnk"))
  }

  /** DuckDB mirror of [[hardNegatives]]. */
  def hardNegativesSql(numQueries: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS anchor_label,
       |             CAST(embedding AS DOUBLE[]) AS qe
       |           FROM embeddings WHERE vec_id < $numQueries),
       |c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
       |             CAST(embedding AS DOUBLE[]) AS ne
       |      FROM embeddings),
       |scored AS (
       |  SELECT query_id, anchor_label, neighbor_id, neighbor_label,
       |    ROUND(list_dot_product(qe, ne), 6) AS cosine
       |  FROM q, c WHERE anchor_label <> neighbor_label)
       |SELECT query_id, anchor_label, neighbor_id, neighbor_label,
       |       cosine, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $k""".stripMargin

  /** Approximate NN, the scale path: multi-table random-hyperplane LSH
    * with 1-bit multiprobe. Each of `numTables` tables sketches a
    * vector to a `planes`-bit bucket (sign of the dot product against
    * deterministic ±1 hyperplanes, seeded by murmur3 of (table, plane,
    * dim)); a query probes its own bucket plus every 1-bit flip in each
    * table; candidates from any table are ranked exactly.
    *
    * Tuning intuition: per-bit agreement p = 1 − θ/π; per-table hit
    * ≈ p^planes + planes·p^(planes−1)(1−p); recall = 1 − (1−hit)^tables.
    * With planes=6, tables=8 this gives ~0.9 recall at cosine ≈ 0.33.
    * NOTE: on corpora with near-orthogonal neighbors (like this
    * synthetic table) candidate reduction is data-limited — LSH only
    * beats brute force when the corpus has real cluster structure. At
    * 100 TB the bucket table is written bucketed-by(table, bucket) so
    * probes become partition-pruned scans instead of a full pass.
    */
  /** Pair-scoring kernel shared by the near-dup paths: left-to-right
    * double accumulation (identical to [[graft.functions.VecDotFloat]])
    * then HALF_UP round to 6 decimals (identical to Spark's round()
    * and DuckDB's ROUND). */
  private[sim] def roundedDot(va: Array[Float], vb: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(va.length, vb.length)
    while (i < n) { acc += va(i).toDouble * vb(i).toDouble; i += 1 }
    java.math.BigDecimal.valueOf(acc)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Embedding-cosine near-duplicate pairs, exact: all (a < b) with
    * round-6 cosine ≥ threshold, via a distributed triangle self-join.
    *
    * On dense unstructured embeddings (this testdata: pair cosines form
    * a continuum 0.35–0.6 straddling any useful threshold — measured
    * with DuckDB at sf0.001/0.01/0.1) NO metric blocking has a recall
    * guarantee, so the exact operator is inherently all-pairs; the job
    * of the engine is to distribute that compute with bounded memory
    * everywhere. Each vector is assigned a block b = id mod B and
    * shipped to the B block-pair tasks (i ≤ j) that involve b — shuffle
    * volume n·B rows, per-task memory 2·n/B vectors, zero driver
    * materialization, compute spread over B(B+1)/2 tasks. For corpora
    * WITH cluster structure use [[cosineNearDupBlocked]], which prunes
    * candidates before rescoring. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double,
      numBlocks: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    // tasks are numbered i*B + j for block pairs i <= j; a vector in
    // block b joins every task where b is the low or the high block.
    val tagged = vecs.flatMap { case (id, v) =>
      val b = java.lang.Long.remainderUnsigned(id, numBlocks).toInt
      val asLow = Iterator.range(b, numBlocks).map(j => (b * numBlocks + j, b, id, v))
      val asHigh = Iterator.range(0, b).map(i => (i * numBlocks + b, b, id, v))
      asLow ++ asHigh
    }
    tagged
      .groupByKey(_._1)
      .flatMapGroups { (task: Int, it: Iterator[(Int, Int, Long, Array[Float])]) =>
        val lowBlock = task / numBlocks
        val highBlock = task % numBlocks
        val low = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        val high = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        it.foreach { case (_, b, id, v) =>
          if (b == lowBlock) low += ((id, v)) else high += ((id, v))
        }
        val pairs =
          if (lowBlock == highBlock) {
            // diagonal task: all unordered pairs within one block
            val arr = low.sortBy(_._1)
            for {
              a <- arr.indices.iterator
              b <- Iterator.range(a + 1, arr.length)
            } yield (arr(a), arr(b))
          } else {
            // off-diagonal: cross product of two disjoint blocks
            for {
              a <- low.iterator
              b <- high.iterator
            } yield if (a._1 < b._1) (a, b) else (b, a)
          }
        pairs.map { case ((ida, va), (idb, vb)) =>
          (ida, idb, roundedDot(va, vb))
        }.filter(_._3 >= threshold)
      }
      .toDF("vec_a", "vec_b", "cosine")
  }

  /** Embedding-cosine near-dup, blocked (the scale path for clustered
    * corpora): multi-table random-hyperplane sketches generate
    * candidate pairs (docs sharing a bucket in ANY table), then ONLY
    * candidates are exactly rescored with the same rounded kernel and
    * filtered at the threshold. Compute scales with Σ f(bucket)²
    * instead of n²; recall for a pair at angle θ is
    * 1 − (1 − (1−θ/π)^planes)^tables. For the default 24×10
    * configuration that is a miss probability of ~4e-5 at cosine 0.95
    * and ~2e-8 at cosine 0.98 — the planted near-dups the gate corpus
    * carries sit at ~0.98, and the sketch is deterministic (seeded
    * hyperplanes), so the oracle-exact gate holds because the seeded
    * sketch is reproducible and verified on that corpus, not because
    * of a universal bound at the threshold. */
  def cosineNearDupBlocked(emb: DataFrame, threshold: Double,
      planes: Int = 10, numTables: Int = 24): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.VecDotFloat.register(spark)
    // (vec_id, tbl, bucket) — numTables lean rows per vector. The
    // self-join's a/b projections rename vec_id differently, which
    // defeats ReuseExchange, so without pinning the hyperplane-sketch
    // pass over the corpus executes TWICE (scan-censused).
    val sketches = bucketSketches(emb, planes, numTables)
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      .localCheckpoint(true)
    val a = sketches.select(col("vec_id").as("vec_a"), col("tbl"), col("bucket"))
    val b = sketches.select(col("vec_id").as("vec_b"), col("tbl"), col("bucket"))
    val candidates = a.join(b, Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    val qe = emb.select(col("vec_id").as("vec_a"), col("embedding").as("qe"))
    val ne = emb.select(col("vec_id").as("vec_b"), col("embedding").as("ne"))
    candidates
      .join(qe, "vec_a")
      .join(ne, "vec_b")
      .withColumn("cosine", round(expr(dotExpr), 6))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Deterministic planted-near-dup corpus for gating the blocked path
    * on data with real cluster structure: the original embeddings plus,
    * per vector, a re-normalized shifted copy (e + shift·𝟙) under
    * vec_id + offset. cos(e, planted(e)) ≥ ~0.98 for unit vectors while
    * unrelated pairs stay below ~0.7, so a 0.95 threshold selects
    * exactly the planted pairs. All arithmetic is per-row double math
    * with a final IEEE double→float cast — bit-identical in DuckDB
    * ([[plantedNearDupBlockedSql]]), which is what lets the blocked
    * query keep a full hash-equality oracle. */
  def plantedNearDups(emb: DataFrame, shift: Double = 0.02,
      offset: Long = 1000000L): DataFrame = {
    val planted = emb
      .select((col("vec_id") + offset).as("vec_id"),
        expr(s"transform(embedding, x -> cast(x as double) + ${shift}d)").as("p"))
      .withColumn("nrm", sqrt(expr("aggregate(p, 0d, (acc, x) -> acc + x * x)")))
      .select(col("vec_id"),
        expr("cast(transform(p, x -> x / nrm) as array<float>)").as("embedding"))
    emb.select(col("vec_id"), col("embedding")).unionByName(planted)
  }

  /** DuckDB mirror of [[cosineNearDupBlocked]] over [[plantedNearDups]]:
    * because the blocked path's recall at planted similarities is
    * 1 − ~1e-8 per pair (and the sketch is deterministic), its output
    * equals the exact all-pairs result, which IS SQL-expressible. */
  def plantedNearDupBlockedSql(threshold: Double, shift: Double,
      offset: Long): String =
    s"""WITH p0 AS (SELECT vec_id + $offset AS vec_id,
       |  list_transform(CAST(embedding AS DOUBLE[]), x -> x + $shift) AS p
       |  FROM embeddings),
       |p1 AS (SELECT vec_id, p, sqrt(list_dot_product(p, p)) AS nrm FROM p0),
       |planted AS (SELECT vec_id,
       |  CAST(list_transform(p, x -> x / nrm) AS FLOAT[]) AS embedding FROM p1),
       |aug AS (SELECT vec_id, embedding FROM embeddings
       |        UNION ALL SELECT vec_id, embedding FROM planted)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
       |FROM aug a, aug b
       |WHERE a.vec_id < b.vec_id
       |AND ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |  CAST(b.embedding AS DOUBLE[])), 6) >= $threshold""".stripMargin

  /** DuckDB mirror of [[cosineNearDupPairs]]. */
  def cosineNearDupSql(threshold: Double): String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |  CAST(b.embedding AS DOUBLE[])), 6) AS cosine
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |AND ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |  CAST(b.embedding AS DOUBLE[])), 6) >= $threshold""".stripMargin

  /** IVF (inverted-file) approximate NN — the other standard scale
    * path: k-means centroids partition the corpus into cells; a query
    * scans only its `nprobe` nearest cells, ranked exactly inside.
    * With nprobe = cells this degenerates to exact brute force (the
    * test's correctness anchor). At 100 TB the cell assignment is a
    * bucketed write, so probes are partition-pruned scans and the
    * centroid table (cells × dims floats) broadcasts everywhere.
    */
  def ivfTopK(emb: DataFrame, numQueries: Int, k: Int,
      cells: Int = 16, nprobe: Int = 4,
      centroidDump: Option[String] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // train centroids on a deterministic sample — at corpus scale the
    // k-means fit always runs on a sample, never the full table. The
    // sample (≤4096 × dims doubles) fits driver memory, so Lloyd's
    // iterations run in-JVM: no per-iteration Spark jobs.
    val sample = emb.orderBy(col("vec_id")).limit(4096)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val centroids = lloydKMeans(sample, cells, iters = 10)
    // engine-written model artifact (the ml_pca_project / unigram
    // pattern): the Lloyd fit stays the documented engine-side float
    // seam, but the RESULTING centroid table is dumped so the oracle
    // can replay assignment/probe/rescore over byte-identical input
    centroidDump.foreach { path =>
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val bc = spark.sparkContext.broadcast(centroids)

    def nearestCells(vec: Array[Float], n: Int): Array[Int] =
      nearestCellsTo(bc.value, vec, n)

    val assigned = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, nearestCells(v, 1)(0)) }
      .toDF("neighbor_id", "ne", "cell")
    val probes = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        nearestCells(v, nprobe).iterator.map(c => (id, v, c))
      }
      .toDF("query_id", "qe", "cell")

    graft.functions.VecDotFloat.register(spark)
    val scored = assigned.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(expr(dotExpr), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** DuckDB oracle for [[ivfTopK]] (r11): the Lloyd fit stays the
    * engine-side float seam, but its RESULT is dumped as a centroid
    * artifact (`centroidDump`) and everything downstream is replayed
    * exactly — cell distances as the same sequential double fold
    * (float upcast − centroid, squared, added in index order; bit-
    * identical via `list_reduce`), assignment/probe as ORDER BY
    * (d, cell) ranks (the engine's stable sort tie rule), rescore as
    * the brute-oracle 6-dp rounded dot. The ml_pca_project /
    * unigram-model artifact-oracle pattern, applied to ANN. */
  def ivfTopKSql(numQueries: Int, k: Int, nprobe: Int,
      centroidGlob: String): String =
    s"""WITH c AS (SELECT cell, centroid FROM read_parquet('$centroidGlob')),
       |dist AS (
       |  SELECT e.vec_id, c.cell,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(e.embedding)),
       |        j -> (CAST(e.embedding[j] AS DOUBLE) - c.centroid[j])
       |           * (CAST(e.embedding[j] AS DOUBLE) - c.centroid[j]))),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, c),
       |ranked AS (
       |  SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |  FROM dist),
       |assigned AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM ranked
       |           WHERE vec_id < $numQueries AND rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.neighbor_id
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE a.neighbor_id <> p.query_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ROUND(list_dot_product(CAST(qe.embedding AS DOUBLE[]),
       |      CAST(ne.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, cosine, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $k""".stripMargin

  /** Materialized IVF store: the cell assignment written cell-PARTITIONED
    * to parquet (plus the centroid table alongside), so probe queries
    * become partition-pruned scans — at 100 TB a probe touches
    * nprobe/cells of the corpus ON DISK, not just in compute. The
    * centroid fit is the same deterministic sample-based Lloyd's as
    * [[ivfTopK]], so store results are identical to the in-memory form. */
  def buildIvfStore(emb: DataFrame, path: String, cells: Int = 16): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb.orderBy(col("vec_id")).limit(4096)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val centroids = lloydKMeans(sample, cells, iters = 10)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, nearestCellsTo(bc.value, v, 1)(0)) }
      .toDF("vec_id", "embedding", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Probe the materialized store: nearest `nprobe` cells per query are
    * computed against the (tiny) centroid table, and the vector scan is
    * FILTERED ON THE PARTITION COLUMN — the parquet source prunes the
    * non-probed cell directories before reading a byte. */
  def ivfStoreTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell")).as[(Int, Array[Double])].collect().map(_._2)
    val bc = spark.sparkContext.broadcast(centroids)
    val probes = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        nearestCellsTo(bc.value, v, nprobe).iterator.map(c => (id, v, c))
      }
      .toDF("query_id", "qe", "cell")
    val probedCells = probes.select("cell").distinct()
      .as[Int].collect().sorted
    graft.functions.VecDotFloat.register(spark)
    val corpus = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
        col("cell"))
    val scored = corpus.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(expr(dotExpr), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** Nearest `n` cells of `vec` by squared L2 against `cs`. */
  private[sim] def nearestCellsTo(cs: Array[Array[Double]], vec: Array[Float],
      n: Int): Array[Int] =
    cs.indices.map { c =>
      var d = 0.0
      var i = 0
      while (i < vec.length) {
        val diff = vec(i) - cs(c)(i); d += diff * diff; i += 1
      }
      (c, d)
    }.sortBy(_._2).take(n).map(_._1).toArray

  /** Plain Lloyd's k-means over an in-memory sample: deterministic
    * (evenly-spaced initialization over the sorted sample), empty
    * cells keep their previous centroid. */
  private[sim] def lloydKMeans(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dims = sample(0).length
    val kk = math.min(k, sample.length)
    val centroids = Array.tabulate(kk)(c => sample((c * sample.length) / kk).clone())
    val assign = new Array[Int](sample.length)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < sample.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var j = 0
          while (j < dims) {
            val diff = sample(i)(j) - centroids(c)(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.ofDim[Double](kk, dims)
      val counts = new Array[Int](kk)
      i = 0
      while (i < sample.length) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < dims) { sums(c)(j) += sample(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dims) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
    }
    centroids
  }

  /** Deterministic ±1 sign for (table, plane, dim) via splitmix64. */
  private def planeSign(t: Int, p: Int, i: Int): Double = {
    var z = (t.toLong * 4096 + p * 64 + i) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    if (((z >>> 17) & 1L) == 1L) 1.0 else -1.0
  }

  /** Bucket sketches in one tight JVM pass (mapPartitions) with the
    * sign matrix precomputed once per partition — ~dims×planes×tables
    * fused multiply-adds per vector, no per-element expression eval.
    * Returns (vec_id, buckets array<int> of length numTables). */
  private[sim] def bucketSketches(emb: DataFrame, planes: Int,
      numTables: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val buffered = it.buffered
        if (!buffered.hasNext) Iterator.empty
        else {
          val dims = buffered.head._2.length
          val signs = Array.tabulate(numTables, planes, dims)(planeSign)
          buffered.map { case (id, vec) =>
            val buckets = Array.tabulate(numTables) { t =>
              var bucket = 0
              var p = 0
              while (p < planes) {
                var dot = 0.0
                var i = 0
                while (i < vec.length) { dot += vec(i) * signs(t)(p)(i); i += 1 }
                if (dot > 0) bucket |= (1 << p)
                p += 1
              }
              bucket
            }
            (id, buckets)
          }
        }
      }
      .toDF("vec_id", "buckets")
  }

  /** DuckDB oracle for [[lshTopK]] (r11): the plane signs are
    * splitmix64 bit math — spelled exactly in u64 HUGEINT arithmetic
    * (graft.util.DuckHash) — and the bucket bit is the sign of a
    * SEQUENTIAL double dot (float upcast × ±1.0, added in index
    * order), which `list_reduce` replays bit-identically (validated:
    * 0 bucket mismatches across all (vec, table) pairs at sf0.001).
    * Multiprobe membership `bucket ∈ {q} ∪ {q ^ 2^b}` is simply
    * Hamming(bucket, q) ≤ 1. Rescore mirrors [[bruteForceTopKSql]].
    * So the FULL approximate path — not just its recall floor — is
    * hash-verified. */
  def lshTopKSql(numQueries: Int, k: Int,
      planes: Int = 6, numTables: Int = 8): String = {
    import graft.util.DuckHash.mul64
    val mask = "18446744073709551615::HUGEINT"
    val c0 = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15
    val c1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
    val c2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb
    s"""WITH signs AS (
       |  SELECT t, p, i,
       |    CASE WHEN (z3 >> 17) & 1::HUGEINT = 1::HUGEINT
       |         THEN 1.0 ELSE -1.0 END AS s
       |  FROM (SELECT t, p, i, xor(z2, z2 >> 31) AS z3
       |    FROM (SELECT t, p, i, ${mul64("xor(z1, z1 >> 27)", c2)} AS z2
       |      FROM (SELECT t, p, i, ${mul64("xor(z0, z0 >> 30)", c1)} AS z1
       |        FROM (SELECT t.t, p.p, i.i,
       |                (((t.t*4096 + p.p*64 + i.i)::HUGEINT + $c0) & $mask) AS z0
       |              FROM (SELECT unnest(range($numTables)) t) t,
       |                   (SELECT unnest(range($planes)) p) p,
       |                   (SELECT unnest(range((SELECT CAST(max(len(embedding)) AS BIGINT)
       |                                         FROM embeddings))) i) i)))) ),
       |sv AS (SELECT t, p, list(s ORDER BY i) AS sv FROM signs GROUP BY 1, 2),
       |dots AS (
       |  SELECT e.vec_id, sv.t, sv.p,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(e.embedding)),
       |        j -> CAST(e.embedding[j] AS DOUBLE) * sv.sv[j])),
       |      (a, x) -> a + x) AS dot
       |  FROM embeddings e, sv),
       |buckets AS (
       |  SELECT vec_id, t,
       |    CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
       |  FROM dots GROUP BY 1, 2),
       |cand AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM buckets q JOIN buckets c ON c.t = q.t
       |  WHERE q.vec_id < $numQueries AND c.vec_id <> q.vec_id
       |    AND bit_count(xor(c.bucket, q.bucket)) <= 1
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ROUND(list_dot_product(CAST(qe.embedding AS DOUBLE[]),
       |      CAST(ne.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, cosine, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $k""".stripMargin
  }

  def lshTopK(emb: DataFrame, numQueries: Int, k: Int,
      planes: Int = 6, numTables: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.VecDotFloat.register(spark)
    // lean (vec_id, buckets) sketch frame, pinned: the corpus side and
    // the query side both explode it (the embedding column is never
    // needed here — joining it back cost two extra corpus scans)
    val sketches = bucketSketches(emb, planes, numTables)
      .localCheckpoint(true)
    val c = sketches.select(col("vec_id").as("neighbor_id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val q = sketches.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        posexplode(col("buckets")).as(Seq("tbl", "qbucket")))
      .withColumn("bucket", explode(expr(
        s"array_union(array(qbucket), transform(sequence(0, $planes - 1), " +
          "b -> cast(qbucket ^ shiftleft(1, b) as int)))")))
      .select("query_id", "tbl", "bucket")
    val candidates = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()

    // numQueries-bounded BEFORE the broadcast (candidates' query_id is
    // already < numQueries, so the filter is lossless) — broadcasting
    // the unfiltered corpus was the one unbounded broadcast in the
    // kNN family
    val qe = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val ne = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = candidates
      .join(broadcast(qe), "query_id")
      .join(ne, "neighbor_id")
      .withColumn("cosine", round(expr(dotExpr), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }
}
