package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus filter — the composition the engine
  * exists for: quality gate → near-dup clustering → keep one canonical
  * doc per cluster → token accounting for the surviving corpus.
  *
  * Everything is declarative DataFrame composition, so Catalyst fuses
  * the quality projection into the scan, the dedup side runs its own
  * bounded-iteration component pass, and the final keep is a
  * semi-join + anti-join on doc_id (both shuffle only ids, never
  * text). At 100 TB: the heavy text columns are touched exactly twice
  * (quality scan, shingle scan); survivors are selected by id joins.
  */
object CorpusPipeline {

  /** @return one row per surviving doc: (doc_id, lang, n_tokens,
    *         n_chars) — quality-"ok" docs minus non-canonical
    *         near-duplicates at `threshold`. */
  def filteredCorpus(docs: DataFrame, threshold: Double): DataFrame = {
    val ok = TextAnalysis.qualityScore(docs)
      .filter(col("quality_bucket") === "ok").select("doc_id")
    val nonCanonical = DedupClusters.fromDocuments(docs, threshold)
      .filter(!col("is_canonical")).select("doc_id")
    docs
      .join(ok, Seq("doc_id"), "left_semi")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).as("n_tokens"),
        length(col("text")).as("n_chars"))
  }

  /** DuckDB mirror: quality subquery + recursive-CTE clusters, NOT IN
    * for the anti-join. */
  def filteredCorpusSql(threshold: Double): String = {
    s"""${DedupClusters.labCtes(threshold)},
       |quality_ok AS (
       |  SELECT doc_id FROM (${TextAnalysis.qualityScoreSql}) q
       |  WHERE q.quality_bucket = 'ok'),
       |non_canonical AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
       |SELECT d.doc_id, d.lang,
       |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS INT) AS n_tokens,
       |  CAST(length(d.text) AS INT) AS n_chars
       |FROM documents d
       |JOIN quality_ok USING (doc_id)
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM non_canonical)""".stripMargin
  }
}
