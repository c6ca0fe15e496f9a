package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Hybrid retrieval — reciprocal-rank fusion (Cormack et al.'s RRF) of
  * the corpus's lexical ranking ([[Bm25]]) and dense ranking
  * ([[graft.sim.Knn.bruteForceTopK]]): the standard way a RAG /
  * training-data pipeline combines keyword and embedding search
  * without score calibration. rrf(d) = Σ_lists 1/(k₀ + rank_list(d)),
  * docs present in only one list contribute that term alone.
  *
  * Scale shape: both input rankings are already top-`depth` (tiny,
  * independent of corpus size), so the fusion is a bounded full-outer
  * join of two ≤depth-row frames — all the 100 TB work lives in the
  * underlying BM25 scan and vector scan, which keep their own
  * scale-shaped plans. Determinism: ranks are integers from
  * deterministically tie-broken orderings, and the fused score is two
  * fixed-order IEEE divisions + one add — bit-identical cross-engine,
  * so the gate carries a full hash oracle.
  */
object HybridRetrieval {

  /** Top-`topK` docs fusing BM25 (for `terms`) with cosine NN of query
    * vector 0. Output: (doc_id, lex_rank, vec_rank, rrf) with -1 for
    * "not in that list". */
  def rrfTopDocs(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      k0: Int = 60, depth: Int = 50, topK: Int = 10): DataFrame = {
    // bounded-frame invariant: both branches are ≤ depth rows (the
    // fused universe is at most 2·depth docs); the constant partition
    // key documents that the single-partition window is the semantics,
    // not a scale hazard
    val wLex = Window.partitionBy(lit(0)).orderBy(desc("score"), col("doc_id"))
    val lex = Bm25.topDocs(docs, terms, topK = depth)
      .withColumn("lex_rank", row_number().over(wLex))
      .select(col("doc_id"), col("lex_rank"))
    val dense = graft.sim.Knn.bruteForceTopK(emb, numQueries = 1, k = depth)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("vec_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(-1)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(-1)).as("vec_rank"),
        (coalesce(lit(1.0) / (lit(k0) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("vec_rank")), lit(0.0))).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(topK)
  }

  /** DuckDB oracle — same rankings, same fusion expression tree. */
  def rrfTopDocsSql(terms: Seq[String], k0: Int = 60, depth: Int = 50,
      topK: Int = 10): String =
    s"""WITH lex0 AS (${Bm25.topDocsSql(terms, topK = depth)}),
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
       |  FROM lex0),
       |dense AS (
       |  SELECT neighbor_id AS doc_id, rnk AS vec_rank
       |  FROM (${graft.sim.Knn.bruteForceTopKSql(1, depth)}) b)
       |SELECT doc_id,
       |  COALESCE(lex_rank, -1) AS lex_rank,
       |  COALESCE(vec_rank, -1) AS vec_rank,
       |  COALESCE(CAST(1.0 AS DOUBLE) / ($k0 + lex_rank), CAST(0.0 AS DOUBLE)) +
       |    COALESCE(CAST(1.0 AS DOUBLE) / ($k0 + vec_rank), CAST(0.0 AS DOUBLE)) AS rrf
       |FROM lex FULL OUTER JOIN dense USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT $topK""".stripMargin
}
