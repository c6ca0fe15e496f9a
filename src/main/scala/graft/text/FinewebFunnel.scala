package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FineWeb-style filtering funnel (Penedo et al. 2024): the standard
  * modern corpus build chains quality rules → dedup → post-dedup
  * length floor, and the release publishes the per-language FUNNEL —
  * how many docs/words survive each stage. This op composes the gated
  * [[GopherRules]] battery, [[LineDedup]]'s C4 span dedup (run on the
  * rule-surviving docs, as the real pipelines do), and a 20-word
  * post-clean length floor into ONE lazy plan ending in the
  * per-language funnel report.
  *
  * Note the stage interaction the composition exercises: span dedup
  * SUBSUMES exact-doc dedup (a full duplicate's every chunk is a
  * later-occurrence and drops), so the classic "exact dedup after
  * near dedup" stage would be vacuous here — the length floor is the
  * stage FineWeb actually applies after dedup.
  *
  * Plan shape at 100 TB: gopher audit is scan-absorbed, span dedup is
  * the two-shuffle LineDedup shape over the REDUCED corpus, the
  * funnel is left-join flags + one rollup — nothing new materializes.
  */
object FinewebFunnel {

  /** Per-language funnel: raw → gopher-kept → span-dedup survivors
    * (≥1 kept chunk) → ≥`minWords` after cleaning, plus final words. */
  def funnel(docs: DataFrame, chunkWords: Int = 8,
      minWords: Int = 20): DataFrame = {
    // doc_id-only survivor set, referenced by BOTH the semi-join and
    // the flags join — pinned so the regex-heavy Gopher audit runs
    // once, not per reference (scan census: 6 → 4 source scans)
    val gopherKept = GopherRules.audit(docs).filter(col("keep"))
      .select(col("doc_id"))
      .localCheckpoint(true)
    val kept = docs.join(gopherKept, Seq("doc_id"), "left_semi")
    val rebuilt = LineDedup.dedupChunks(kept, chunkWords)
      .filter(col("n_kept") > 0)
      .withColumn("final_words",
        size(split(col("clean_text"), " ")).cast("long"))
    val flags = docs.select(col("doc_id"), col("lang"))
      .join(gopherKept.withColumn("g", lit(true)), Seq("doc_id"), "left")
      .join(rebuilt.select(col("doc_id"), lit(true).as("s"),
        col("final_words")), Seq("doc_id"), "left")
      .withColumn("f", col("s") && col("final_words") >= minWords)
    flags.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("g"), 1L).otherwise(0L)).as("n_gopher"),
        sum(when(col("s"), 1L).otherwise(0L)).as("n_span_dedup"),
        sum(when(col("f"), 1L).otherwise(0L)).as("n_final"),
        sum(when(col("f"), col("final_words")).otherwise(0L))
          .as("words_final"))
  }

  /** DuckDB mirror: the same three composed stages. */
  def funnelSql(chunkWords: Int = 8, minWords: Int = 20): String =
    s"""WITH gopher AS (
       |  SELECT doc_id FROM (${GopherRules.auditSql("documents")}) ga
       |  WHERE keep),
       |kd AS (SELECT d.doc_id, d.text FROM documents d
       |       JOIN gopher USING (doc_id)),
       |${LineDedup.dedupChunksCtes(chunkWords, "kd")},
       |surv AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS final_words
       |  FROM rebuilt WHERE n_kept > 0)
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_raw,
       |  CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_gopher,
       |  CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_span_dedup,
       |  CAST(SUM(CASE WHEN s.final_words >= $minWords THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_final,
       |  CAST(SUM(CASE WHEN s.final_words >= $minWords THEN s.final_words
       |                ELSE 0 END) AS BIGINT) AS words_final
       |FROM documents d
       |LEFT JOIN gopher g USING (doc_id)
       |LEFT JOIN surv s ON d.doc_id = s.doc_id
       |GROUP BY 1""".stripMargin
}
