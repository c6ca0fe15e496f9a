package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inverted-index construction — the retrieval substrate under BM25/
  * TF-IDF serving: per term, document frequency, total term frequency,
  * and the head of the sorted posting list. This is the materializable
  * artifact (term → postings) a sparse-retrieval stack shards and
  * serves; the BM25/TF-IDF gates consume scores, this op emits the
  * index itself.
  *
  * Scale shape: one token explode → (term, doc_id) partial-agg (map-
  * side combine collapses repeated terms within a doc before the
  * shuffle), then ONE term-partitioned exchange shared by the ranking
  * window and the final per-term aggregate (same key → Catalyst reuses
  * the exchange). The posting list is HEAD-BOUNDED (first `headN` doc
  * ids): an unbounded collect_list on a stopword's posting row would
  * hold ~n_docs ids in one aggregation buffer at 100 TB — the classic
  * inverted-index hot-key. df/tf_total stay exact over ALL postings;
  * only the materialized id list is capped (serving systems page the
  * tail from the doc-sorted index shard anyway).
  */
object InvertedIndex {

  /** Build the index over documents(doc_id, text): one row per term —
    * (term, df, tf_total, postings_head). */
  def build(docs: DataFrame, headN: Int = 20): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val perDoc = tok.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    perDoc
      .withColumn("rn", row_number().over(w))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        concat_ws(",", sort_array(collect_list(
          when(col("rn") <= headN, col("doc_id"))))).as("postings_head"))
  }

  /** DuckDB mirror of [[build]]. */
  def buildSql(headN: Int = 20): String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |perdoc AS (
       |  SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |ranked AS (
       |  SELECT term, doc_id, tf,
       |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM perdoc)
       |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       |  CAST(SUM(tf) AS BIGINT) AS tf_total,
       |  COALESCE(string_agg(CASE WHEN rn <= $headN
       |    THEN CAST(doc_id AS VARCHAR) END, ',' ORDER BY doc_id), '')
       |    AS postings_head
       |FROM ranked GROUP BY 1""".stripMargin
}
