package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Int8 scalar quantization (SQ8) of the embedding column — the
  * memory-scale path every vector store ships alongside PQ: 4 bytes →
  * 1 byte per dimension with per-dimension symmetric max-abs
  * calibration, and similarity scored as the INTEGER dot product of the
  * codes (Faiss `ScalarQuantizer` QT_8bit_direct-style; Jégou et al.
  * 2011 §II for the asymmetric-distance framing).
  *
  * Cross-engine exactness: the calibration scale is a max of exactly
  * representable floats, the code is `round(x / s · 127)` evaluated on
  * the identical IEEE expression tree in both engines (both round
  * half-away-from-zero), and the score is a sum of int×int products —
  * pure integer arithmetic, far below 2⁵³. So unlike the float-cosine
  * gates there is no rounding epsilon anywhere: the oracle hash is
  * exact by construction.
  *
  * Plan shape at 100 TB: calibration is one posexplode + per-dimension
  * max (map-combinable, d-bounded output) that rides back as a 1-row
  * broadcast array; encoding is a stateless map; search is the
  * broadcast-queries × corpus scan with NO shuffle of the big side —
  * identical to [[Knn.bruteForceTopK]] but over 8-bit codes, i.e. 4×
  * less scan bandwidth, which IS the point of SQ8 at scale.
  */
object ScalarQuant {

  /** Per-dimension symmetric scales as a 1-row frame (dims d-bounded).
    * map_from_entries fixes collect_list's nondeterministic order. */
  private def scales(emb: DataFrame, dims: Int): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy(col("p")).agg(max(abs(col("x"))).as("s"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("s")))).as("sm"))
      .select(expr(s"transform(sequence(0, $dims - 1), i -> CAST(sm[i] AS DOUBLE))")
        .as("scales"))

  /** Encoded corpus: (vec_id, label, codes array<int> in [-127, 127]).
    * A dimension whose max|x| is 0 (constant-zero column) has scale 0;
    * both engines emit code 0 for it rather than dividing by zero —
    * without the guard Spark would yield NaN→null codes while DuckDB
    * errors on CAST(NaN AS INT), i.e. the engines would fail
    * DIFFERENTLY instead of agreeing. */
  def encode(emb: DataFrame, dims: Int = 64): DataFrame =
    emb.crossJoin(broadcast(scales(emb, dims)))
      .select(col("vec_id"), col("label"),
        expr("zip_with(embedding, scales, (x, s) -> IF(s = 0D, 0, " +
          "CAST(round(CAST(x AS DOUBLE) / s * 127) AS INT)))").as("codes"))

  /** Exact top-k under the quantized integer dot product: queries =
    * vec_id < numQueries, score = Σ codeᵢ(q)·codeᵢ(n) as BIGINT,
    * tiebreak on neighbor_id. */
  def int8TopK(emb: DataFrame, numQueries: Int = 25, k: Int = 10,
      dims: Int = 64): DataFrame = {
    // int8 codes are 4× leaner than the float source and read by BOTH
    // pair sides — pinned so the scales pass + quantization run once
    // (scan census: 4 → 2 embeddings scans)
    val codes = encode(emb, dims).localCheckpoint(true)
    val q = codes.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("codes").as("qc"))
    val c = codes.select(col("vec_id").as("neighbor_id"), col("codes").as("nc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qc, nc, (a, b) -> CAST(a AS BIGINT) * b), 0L, (acc, v) -> acc + v)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot"), col("rnk"))
  }

  /** DuckDB mirror of [[int8TopK]] — same scales, codes, and integer
    * scores. list_dot_product on the int codes is exact in double
    * (|dot| ≤ d·127² ≪ 2⁵³), cast back to BIGINT. */
  def int8TopKSql(numQueries: Int = 25, k: Int = 10): String =
    s"""WITH dimmax AS (
       |  SELECT p, MAX(abs(x)) AS s FROM (
       |    SELECT unnest(embedding) AS x,
       |           generate_subscripts(embedding, 1) - 1 AS p
       |    FROM embeddings) GROUP BY 1),
       |flat AS (
       |  SELECT vec_id, unnest(embedding) AS x,
       |         generate_subscripts(embedding, 1) - 1 AS p
       |  FROM embeddings),
       |codes AS (
       |  SELECT f.vec_id,
       |    list(CASE WHEN d.s = 0 THEN 0
       |         ELSE CAST(round(CAST(f.x AS DOUBLE) / d.s * 127) AS INT) END
       |         ORDER BY f.p) AS codes
       |  FROM flat f JOIN dimmax d ON f.p = d.p
       |  GROUP BY 1),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(list_dot_product(CAST(q.codes AS DOUBLE[]),
       |                          CAST(c.codes AS DOUBLE[])) AS BIGINT) AS dot
       |  FROM codes q, codes c
       |  WHERE q.vec_id < $numQueries AND q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, dot, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY dot DESC, neighbor_id) AS INT) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $k""".stripMargin
}
