package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantized ANN (Jégou et al.'s PQ): the memory-scale path of
  * the similarity family. Vectors are split into `subspaces`
  * subvectors; each subspace gets its own small k-means codebook (fit
  * on the same bounded deterministic sample as IVF — never a
  * full-table pass); a vector is stored as one small code per
  * subspace. At 64 dims / 8 subspaces / ≤256 centroids that is 8
  * bytes per vector instead of 256 — a 32× smaller corpus
  * representation, which is what makes billion-vector search fit a
  * cluster's memory at all.
  *
  * Query path is ADC (asymmetric distance computation): per query,
  * one lookup table of dot(query_sub, centroid) per subspace
  * (subspaces × centroids doubles, broadcast); a candidate's
  * approximate cosine is `subspaces` table lookups + adds — no float
  * vector is touched. The top `rerank` candidates per query are then
  * exactly rescored against their true embeddings (the standard
  * ADC + rerank design), with the same rounded kernel and tie-break
  * as brute force, so with `rerank` ≥ corpus the result EQUALS
  * [[Knn.bruteForceTopK]] (the PqSpec anchor).
  *
  * Scale shape: codes table is narrow (id + bytes) and shuffles
  * nothing; scoring is a map over the codes with broadcast tables;
  * only ≤ rerank×queries rows join back to the fat embedding table.
  */
object Pq {

  /** Nearest-centroid code per subspace for `v` against `cbs`. */
  private[sim] def encodeWith(cbs: Array[Array[Array[Double]]],
      v: Array[Float]): Array[Int] =
    Array.tabulate(cbs.length) { s =>
      val cb = cbs(s)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0; var j = 0
        while (j < cb(c).length) {
          val diff = v(s * cb(c).length + j) - cb(c)(j)
          d += diff * diff; j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** ADC lookup table for query `q`: per subspace, dot(query_sub, c)
    * for every centroid c. */
  private[sim] def lutFor(codebooks: Array[Array[Array[Double]]],
      q: Array[Float], sub: Int): Array[Array[Double]] =
    Array.tabulate(codebooks.length) { s =>
      codebooks(s).map { cent =>
        var d = 0.0; var j = 0
        while (j < cent.length) { d += q(s * sub + j) * cent(j); j += 1 }
        d
      }
    }

  /** (query_id, neighbor_id, cosine, rnk) top-k per query. */
  def pqTopK(emb: DataFrame, numQueries: Int, k: Int, subspaces: Int = 8,
      centroidsPerSub: Int = 256, rerank: Int = 64,
      codebookDump: Option[String] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb.orderBy(col("vec_id")).limit(4096)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val dims = sample(0).length
    require(dims % subspaces == 0, s"dims $dims not divisible by $subspaces")
    val sub = dims / subspaces
    // per-subspace codebooks from the shared sample (deterministic)
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(subspaces) {
      s => Knn.lloydKMeans(sample.map(_.slice(s * sub, (s + 1) * sub)),
        centroidsPerSub, iters = 10)
    }
    // engine-written model artifact (the ivfTopK centroid pattern):
    // the per-subspace Lloyd fits stay the engine-side float seam; the
    // RESULTING codebooks are dumped so the oracle can replay
    // encode/ADC/rerank over byte-identical input
    codebookDump.foreach { path =>
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
      }.toSeq.toDF("s", "c", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val bc = spark.sparkContext.broadcast(codebooks)

    val codes = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, encodeWith(bc.value, v)) }
      .toDF("neighbor_id", "codes")

    // per-query ADC lookup tables, broadcast with the query set
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val luts: Array[(Long, Array[Array[Double]])] = queries.map { case (qid, q) =>
      qid -> lutFor(codebooks, q, sub)
    }
    val bcLuts = spark.sparkContext.broadcast(luts)

    val approx = codes.as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bcLuts.value
        it.flatMap { case (nid, cs) =>
          qs.iterator.filter(_._1 != nid).map { case (qid, lut) =>
            var s = 0.0; var i = 0
            while (i < cs.length) { s += lut(i)(cs(i)); i += 1 }
            (qid, nid, s)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val candidates = approx.withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= rerank)
      .select("query_id", "neighbor_id")

    // exact rescore of candidates only — same kernel as brute force
    graft.functions.VecDotFloat.register(spark)
    // numQueries-bounded BEFORE the broadcast (lossless: every
    // candidate query_id is < numQueries by construction) — the
    // unfiltered form broadcast the whole corpus to rescore 25 queries
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(q), "query_id")
      .join(n, "neighbor_id")
      .withColumn("cosine", round(expr(Knn.dotExpr), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** DuckDB oracle for [[pqTopK]] (r11): the per-subspace Lloyd fits
    * are dumped as a codebook artifact and the WHOLE ADC pipeline is
    * replayed exactly — encoding as ordered squared-distance folds
    * with the engine's strict-< argmin (ORDER BY d, c), the per-query
    * lookup tables as ordered subvector dots, the approximate score as
    * an IN-SUBSPACE-ORDER fold of the 8 lookups (bit-identical to the
    * engine's sequential adds), candidate selection as
    * (approx DESC, neighbor_id) ranks at the same `rerank`, and the
    * exact rescore as the brute-oracle rounded dot. `sub` (dims per
    * subspace) is read off the artifact itself (len(centroid)). */
  def pqTopKSql(numQueries: Int, k: Int, rerank: Int,
      codebookGlob: String): String =
    s"""WITH cb AS (SELECT s, c, centroid FROM read_parquet('$codebookGlob')),
       |enc AS (
       |  SELECT e.vec_id, cb.s, cb.c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(cb.centroid)),
       |        j -> (CAST(e.embedding[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |                - cb.centroid[j])
       |           * (CAST(e.embedding[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |                - cb.centroid[j]))),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, cb),
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
       |    FROM enc) t
       |  WHERE rn = 1),
       |luts AS (
       |  SELECT q.vec_id AS query_id, cb.s, cb.c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(cb.centroid)),
       |        j -> CAST(q.embedding[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |           * cb.centroid[j])),
       |      (a, x) -> a + x) AS lv
       |  FROM embeddings q, cb WHERE q.vec_id < $numQueries),
       |approx AS (
       |  SELECT l.query_id, co.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(l.lv ORDER BY l.s)), (a, x) -> a + x) AS approx
       |  FROM codes co JOIN luts l ON l.s = co.s AND l.c = co.code
       |  WHERE co.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY approx DESC, neighbor_id) AS arnk
       |    FROM approx) t
       |  WHERE arnk <= $rerank),
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

  /** PCA × PQ — OPQ-lite: decorrelate and compact the vectors with a
    * PCA front-end (graft.ml.Pca — exact covariance fold, driver
    * eigensolve), PQ-code the PROJECTED vectors for candidate
    * generation, then exact-rescore candidates in the ORIGINAL space.
    * Rotating into the eigenbasis before product-splitting is the
    * standard fix for PQ's weakness (correlated subspaces waste
    * codebook entropy — the motivation behind OPQ; PCA is its
    * no-iteration first step), and the projected vectors are
    * `pcaDims`-wide, so codes AND luts shrink by d/pcaDims.
    *
    * Scale: the PCA model and codebooks are bounded driver artifacts
    * (like every codebook here); candidates stream through the same
    * broadcast-LUT mapPartitions as [[pqTopK]]; the original-space
    * rescore touches `rerank` rows per query only. */
  def pcaPqTopK(emb: DataFrame, numQueries: Int, k: Int,
      pcaDims: Int = 32, subspaces: Int = 8, centroidsPerSub: Int = 32,
      rerank: Int = 64, modelDump: Option[String] = None,
      codebookDump: Option[String] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val m = graft.ml.Pca.fit(
      emb.select(col("embedding")).as[Array[Float]], pcaDims)
    // engine-written model artifact (the ml_pca_project pattern): the
    // covariance fold + eigensolve stay the engine-side float seam; the
    // RESULTING (mean, loading) table is dumped so the oracle can
    // replay projection/encode/ADC over byte-identical input
    modelDump.foreach { path =>
      spark.createDataFrame(m.components.zipWithIndex.toSeq
          .map { case (w, c) => (c, m.mean.toSeq, w.toSeq) })
        .toDF("pc", "mu", "w")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val projEmb = graft.ml.Pca.project(emb, "embedding", m)
      .select(col("vec_id"),
        array((0 until pcaDims).map(i => col(s"pc$i").cast("float")): _*)
          .as("embedding"))
      // pcaDims-wide (d/pcaDims smaller than the source) and read
      // three ways by pqTopK (codebook sample, code pass, query
      // collect) — pinned so the projection runs once, not per
      // reference (scan census: 5 → 2 embeddings scans)
      .localCheckpoint(true)
    val candidates = pqTopK(projEmb, numQueries, k = rerank, subspaces,
      centroidsPerSub, rerank, codebookDump)
      .select("query_id", "neighbor_id")
    // exact rescore in the ORIGINAL space
    graft.functions.VecDotFloat.register(spark)
    // numQueries-bounded BEFORE the broadcast (lossless: every
    // candidate query_id is < numQueries by construction) — the
    // unfiltered form broadcast the whole corpus to rescore 25 queries
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(q), "query_id")
      .join(n, "neighbor_id")
      .withColumn("cosine", round(expr(Knn.dotExpr), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** DuckDB oracle for [[pcaPqTopK]] (r12): composes the two already-
    * proven replays — ml_pca_project's projection fold over the dumped
    * (mean, loading) model and pqTopKSql's encode/ADC/rerank over the
    * dumped codebooks fitted in the PROJECTED space. The only new link
    * is the float32 narrowing between them: the engine casts each
    * projected double to float (`.cast("float")`, IEEE round-to-
    * nearest) before PQ sees it, and DuckDB's `CAST(v AS FLOAT)` is
    * the same correctly-rounded conversion of a bit-identical double,
    * so the projected float vectors agree bitwise. The inner projected-
    * space rescore is selection-neutral (pqTopK runs with k = rerank,
    * so all `rerank` ADC candidates survive it) and is therefore not
    * replayed; candidates are the ADC top-`rerank` by
    * (approx DESC, neighbor_id) and the final rescore is the brute-
    * oracle rounded dot in the ORIGINAL space. */
  def pcaPqTopKSql(numQueries: Int, k: Int, rerank: Int,
      modelGlob: String, codebookGlob: String): String =
    s"""WITH m AS (SELECT pc, mu, w FROM read_parquet('$modelGlob')),
       |cb AS (SELECT s, c, centroid FROM read_parquet('$codebookGlob')),
       |proj AS (
       |  SELECT e.vec_id, m.pc,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(e.embedding)),
       |        i -> (CAST(e.embedding[i] AS DOUBLE) - m.mu[i]) * m.w[i])),
       |      (acc, x) -> acc + x) AS v
       |  FROM embeddings e, m),
       |pvec AS (
       |  SELECT vec_id, list(CAST(v AS FLOAT) ORDER BY pc) AS pemb
       |  FROM proj GROUP BY vec_id),
       |enc AS (
       |  SELECT p.vec_id, cb.s, cb.c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(cb.centroid)),
       |        j -> (CAST(p.pemb[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |                - cb.centroid[j])
       |           * (CAST(p.pemb[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |                - cb.centroid[j]))),
       |      (a, x) -> a + x) AS d
       |  FROM pvec p, cb),
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
       |    FROM enc) t
       |  WHERE rn = 1),
       |luts AS (
       |  SELECT q.vec_id AS query_id, cb.s, cb.c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(cb.centroid)),
       |        j -> CAST(q.pemb[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |           * cb.centroid[j])),
       |      (a, x) -> a + x) AS lv
       |  FROM pvec q, cb WHERE q.vec_id < $numQueries),
       |approx AS (
       |  SELECT l.query_id, co.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(l.lv ORDER BY l.s)), (a, x) -> a + x) AS approx
       |  FROM codes co JOIN luts l ON l.s = co.s AND l.c = co.code
       |  WHERE co.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY approx DESC, neighbor_id) AS arnk
       |    FROM approx) t
       |  WHERE arnk <= $rerank),
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

  /** IVF × PQ — the composed billion-vector architecture (IVFADC,
    * Jégou et al. §IV): k-means cells route each query to its `nprobe`
    * nearest cells, ADC scores ONLY the PQ codes stored in those cells,
    * and the top `rerank` candidates per query are exactly rescored.
    * Versus flat PQ this cuts the ADC stage from n codes per query to
    * ~n·nprobe/cells; versus plain IVF it scans 8-byte codes instead of
    * float vectors inside a cell.
    *
    * At 100 TB the codes table is written partitioned by cell (like
    * [[Knn.buildIvfStore]]), so the ADC stage is a partition-pruned
    * scan of nprobe/cells of an already-32×-smaller representation; the
    * codebooks + per-query LUTs broadcast (subspaces × 256 doubles per
    * query); only rerank × queries rows ever touch the fat table.
    *
    * Correctness anchors (PqSpec): nprobe = cells ∧ rerank ≥ corpus
    * ⇒ result EQUALS [[Knn.bruteForceTopK]]; default params hold a
    * recall floor vs brute force.
    */
  def ivfPqTopK(emb: DataFrame, numQueries: Int, k: Int, cells: Int = 16,
      nprobe: Int = 4, subspaces: Int = 8, centroidsPerSub: Int = 256,
      rerank: Int = 64, centroidDump: Option[String] = None,
      codebookDump: Option[String] = None): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // one shared deterministic sample trains BOTH quantizers — at
    // corpus scale this is the only non-streaming input, and it is
    // bounded (4096 × dims doubles).
    val sample = emb.orderBy(col("vec_id")).limit(4096)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val dims = sample(0).length
    require(dims % subspaces == 0, s"dims $dims not divisible by $subspaces")
    val sub = dims / subspaces
    val centroids = Knn.lloydKMeans(sample, cells, iters = 10)
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(subspaces) {
      s => Knn.lloydKMeans(sample.map(_.slice(s * sub, (s + 1) * sub)),
        centroidsPerSub, iters = 10)
    }
    // engine-written model artifacts (the ivfTopK / pqTopK patterns
    // composed): both quantizer fits stay the engine-side float seam;
    // the RESULTING centroid and codebook tables are dumped so the
    // oracle can replay routing + encode/ADC over byte-identical input
    centroidDump.foreach { path =>
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    codebookDump.foreach { path =>
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
      }.toSeq.toDF("s", "c", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val bcCells = spark.sparkContext.broadcast(centroids)
    val bcCb = spark.sparkContext.broadcast(codebooks)

    // one corpus pass: cell assignment + PQ codes (narrow: id, int, 8 ints)
    val codes = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcCells.value; val cbs = bcCb.value
        it.map { case (id, v) =>
          (id, Knn.nearestCellsTo(cs, v, 1)(0), encodeWith(cbs, v))
        }
      }
      .toDF("neighbor_id", "cell", "codes")

    // per-query routing (probed cell set) + ADC lookup table, broadcast
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val probes: Array[(Long, Array[Int], Array[Array[Double]])] =
      queries.map { case (qid, q) =>
        (qid, Knn.nearestCellsTo(centroids, q, nprobe), lutFor(codebooks, q, sub))
      }
    val bcProbes = spark.sparkContext.broadcast(probes)

    // ADC over probed cells only — a map over the codes scan, no shuffle
    val approx = codes.as[(Long, Int, Array[Int])]
      .mapPartitions { it =>
        val qs = bcProbes.value
        it.flatMap { case (nid, cell, cs) =>
          qs.iterator
            .filter { case (qid, pcells, _) => qid != nid && pcells.contains(cell) }
            .map { case (qid, _, lut) =>
              var s = 0.0; var i = 0
              while (i < cs.length) { s += lut(i)(cs(i)); i += 1 }
              (qid, nid, s)
            }
        }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val candidates = approx.withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= rerank)
      .select("query_id", "neighbor_id")

    // exact rescore of candidates only — same kernel as brute force
    graft.functions.VecDotFloat.register(spark)
    // numQueries-bounded BEFORE the broadcast (lossless: every
    // candidate query_id is < numQueries by construction) — the
    // unfiltered form broadcast the whole corpus to rescore 25 queries
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(q), "query_id")
      .join(n, "neighbor_id")
      .withColumn("cosine", round(expr(Knn.dotExpr), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }

  /** DuckDB oracle for [[ivfPqTopK]] and [[ivfPqStoreTopK]] (r12):
    * composes the two already-proven replays — ivfTopKSql's cell
    * assignment/probe (ordered squared-distance fold, ORDER BY
    * (d, cell) matching the engine's stable-sort tie rule) over the
    * dumped coarse centroids, and pqTopKSql's encode/ADC/rerank over
    * the dumped codebooks — with the IVF restriction spliced into the
    * ADC stage: a (query, neighbor) pair scores only when the
    * neighbor's assigned cell is among the query's `nprobe` probed
    * cells (exactly the engine's `pcells.contains(cell)` guard; the
    * store form's probed-cells partition pruning is a superset filter
    * of the same per-query guard, so both gates share this oracle).
    * `subCol`/`codeCol` name the codebook artifact's subspace/index
    * columns (the store dumps them as sub/cidx). */
  def ivfPqTopKSql(numQueries: Int, k: Int, nprobe: Int, rerank: Int,
      centroidGlob: String, codebookGlob: String,
      subCol: String = "s", codeCol: String = "c"): String =
    s"""WITH ctr AS (SELECT cell, centroid FROM read_parquet('$centroidGlob')),
       |cb AS (SELECT $subCol AS s, $codeCol AS c, centroid
       |       FROM read_parquet('$codebookGlob')),
       |celld AS (
       |  SELECT e.vec_id, ctr.cell,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(e.embedding)),
       |        j -> (CAST(e.embedding[j] AS DOUBLE) - ctr.centroid[j])
       |           * (CAST(e.embedding[j] AS DOUBLE) - ctr.centroid[j]))),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, ctr),
       |cellranked AS (
       |  SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
       |  FROM celld),
       |assigned AS (SELECT vec_id, cell FROM cellranked WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cell FROM cellranked
       |           WHERE vec_id < $numQueries AND rn <= $nprobe),
       |enc AS (
       |  SELECT e.vec_id, cb.s, cb.c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(cb.centroid)),
       |        j -> (CAST(e.embedding[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |                - cb.centroid[j])
       |           * (CAST(e.embedding[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |                - cb.centroid[j]))),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, cb),
       |codes AS (
       |  SELECT vec_id, s, c AS code FROM (
       |    SELECT vec_id, s, c,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
       |    FROM enc) t
       |  WHERE rn = 1),
       |luts AS (
       |  SELECT q.vec_id AS query_id, cb.s, cb.c,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(cb.centroid)),
       |        j -> CAST(q.embedding[cb.s * len(cb.centroid) + j] AS DOUBLE)
       |           * cb.centroid[j])),
       |      (a, x) -> a + x) AS lv
       |  FROM embeddings q, cb WHERE q.vec_id < $numQueries),
       |approx AS (
       |  SELECT l.query_id, co.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(l.lv ORDER BY l.s)), (a, x) -> a + x) AS approx
       |  FROM codes co
       |  JOIN assigned a ON a.vec_id = co.vec_id
       |  JOIN luts l ON l.s = co.s AND l.c = co.code
       |  JOIN probes p ON p.query_id = l.query_id AND p.cell = a.cell
       |  WHERE co.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY approx DESC, neighbor_id) AS arnk
       |    FROM approx) t
       |  WHERE arnk <= $rerank),
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

  /** Materialized IVFADC store — the on-disk layout a billion-vector
    * serving tier actually deploys (combines [[Knn.buildIvfStore]]'s
    * cell-partitioned files with [[ivfPqTopK]]'s compressed codes):
    *
    *  - `centroids`: (cell, centroid) — the coarse router, tiny.
    *  - `codebooks`: (sub, cidx, centroid) — PQ dictionaries, tiny.
    *  - `codes`: (vec_id, codes) PARTITIONED BY cell — the scan target.
    *
    * A probe reads nprobe/cells of the codes tree — and the codes are
    * ~32× smaller than the float vectors, so the pruned scan touches
    * nprobe/cells of an already-compressed representation; the fat
    * embedding table is only joined for the final `rerank` candidates
    * per query. Both quantizers train on the same deterministic sample
    * as the in-memory forms, so store results are reproducible. */
  def buildIvfPqStore(emb: DataFrame, path: String, cells: Int = 16,
      subspaces: Int = 8, centroidsPerSub: Int = 256): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = emb.orderBy(col("vec_id")).limit(4096)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val dims = sample(0).length
    require(dims % subspaces == 0, s"dims $dims not divisible by $subspaces")
    val sub = dims / subspaces
    val centroids = Knn.lloydKMeans(sample, cells, iters = 10)
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(subspaces) {
      s => Knn.lloydKMeans(sample.map(_.slice(s * sub, (s + 1) * sub)),
        centroidsPerSub, iters = 10)
    }
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    codebooks.zipWithIndex.flatMap { case (cb, sIdx) =>
      cb.zipWithIndex.map { case (c, i) => (sIdx, i, c) }
    }.toSeq.toDF("sub", "cidx", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcCb = spark.sparkContext.broadcast(codebooks)
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bcC.value; val cbs = bcCb.value
        it.map { case (id, v) =>
          (id, encodeWith(cbs, v), Knn.nearestCellsTo(cs, v, 1)(0))
        }
      }
      .toDF("vec_id", "codes", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Probe the materialized IVFADC store: routing + LUTs come from the
    * tiny centroid/codebook tables, the ADC stage is a PARTITION-PRUNED
    * scan of the probed cells' code files only (the parquet source
    * drops non-probed cell directories before reading a byte), and the
    * exact rescore joins `emb` for just rerank × queries candidates. */
  def ivfPqStoreTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      emb: DataFrame, numQueries: Int, k: Int, nprobe: Int = 4,
      rerank: Int = 64): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell")).as[(Int, Array[Double])].collect().map(_._2)
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .as[(Int, Int, Array[Double])].collect()
    val subspaces = cbRows.map(_._1).max + 1
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(subspaces) {
      s => cbRows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    val sub = codebooks(0)(0).length
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val probes: Array[(Long, Array[Int], Array[Array[Double]])] =
      queries.map { case (qid, q) =>
        (qid, Knn.nearestCellsTo(centroids, q, nprobe), lutFor(codebooks, q, sub))
      }
    val bcProbes = spark.sparkContext.broadcast(probes)
    val probedCells = probes.flatMap(_._2).distinct.sorted

    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
    val approx = codes.as[(Long, Array[Int], Int)]
      .mapPartitions { it =>
        val qs = bcProbes.value
        it.flatMap { case (nid, cs, cell) =>
          qs.iterator
            .filter { case (qid, pcells, _) => qid != nid && pcells.contains(cell) }
            .map { case (qid, _, lut) =>
              var acc = 0.0; var i = 0
              while (i < cs.length) { acc += lut(i)(cs(i)); i += 1 }
              (qid, nid, acc)
            }
        }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val candidates = approx.withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= rerank)
      .select("query_id", "neighbor_id")

    graft.functions.VecDotFloat.register(spark)
    // numQueries-bounded BEFORE the broadcast (lossless: every
    // candidate query_id is < numQueries by construction) — the
    // unfiltered form broadcast the whole corpus to rescore 25 queries
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val n = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .join(broadcast(q), "query_id")
      .join(n, "neighbor_id")
      .withColumn("cosine", round(expr(Knn.dotExpr), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
  }
}
