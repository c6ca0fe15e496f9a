package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Gopher quality-filter rule set (Rae et al. 2021, appendix A1.1)
  * — the published heuristic battery most later corpora (MassiveText,
  * RefinedWeb, FineWeb) start from. Implemented as one stateless
  * per-document projection (word stats fold in a single pass over the
  * split array via higher-order functions, no explode, no shuffle),
  * so at 100 TB this is a narrow map the scan absorbs.
  *
  * Rules (thresholds are the paper's):
  *  1. 50 ≤ word_count ≤ 100000
  *  2. 3 ≤ mean_word_len ≤ 10
  *  3. symbol_to_word_ratio ≤ 0.1   (symbols: '#' and '...')
  *  4. alpha_word_frac ≥ 0.8        (words containing ≥1 [a-z])
  *  5. stopword_hits ≥ 2            (the paper's 8-stopword list)
  *
  * Ratios are exact rationals of integer counts evaluated on the same
  * expression tree in both engines; no rounding needed.
  */
object GopherRules {

  private val stopwords = Seq("the", "be", "to", "of", "and", "that",
    "have", "with")

  /** Per-doc rule metrics + verdicts + the overall keep flag. */
  def audit(docs: DataFrame): DataFrame = {
    val sw = stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("word_count", size(col("ws")).cast("long"))
      // total chars across words = chars(text) - separators
      .withColumn("mean_word_len",
        (length(col("text")) - (col("word_count") - 1)).cast("double") /
          col("word_count").cast("double"))
      .withColumn("symbol_count",
        (expr("size(filter(ws, w -> w = '#'))") +
          expr("size(filter(ws, w -> w = '...'))")).cast("long"))
      .withColumn("alpha_words",
        expr("size(filter(ws, w -> w rlike '[a-z]'))").cast("long"))
      .withColumn("stopword_hits",
        expr(s"size(filter(ws, w -> array_contains($sw, w)))").cast("long"))
      .select(
        col("doc_id"), col("word_count"), col("mean_word_len"),
        col("symbol_count"), col("alpha_words"), col("stopword_hits"),
        (col("word_count") >= 50 && col("word_count") <= 100000).as("ok_words"),
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("ok_len"),
        (col("symbol_count").cast("double") <=
          lit(0.1) * col("word_count").cast("double")).as("ok_symbols"),
        (col("alpha_words").cast("double") >=
          lit(0.8) * col("word_count").cast("double")).as("ok_alpha"),
        (col("stopword_hits") >= 2).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_words") && col("ok_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stopwords"))
  }

  /** DuckDB mirror — identical counts and threshold algebra. `from`
    * parameterizes the source relation for composed pipelines. */
  def auditSql: String = auditSql("documents")
  def auditSql(from: String): String = {
    val swList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS word_count
       |  FROM $from),
       |m AS (
       |  SELECT doc_id, word_count,
       |    CAST(length(text) - (word_count - 1) AS DOUBLE)
       |      / CAST(word_count AS DOUBLE) AS mean_word_len,
       |    CAST(len(list_filter(ws, w -> w = '#'))
       |       + len(list_filter(ws, w -> w = '...')) AS BIGINT) AS symbol_count,
       |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT)
       |      AS alpha_words,
       |    CAST(len(list_filter(ws, w -> list_contains($swList, w))) AS BIGINT)
       |      AS stopword_hits
       |  FROM t)
       |SELECT doc_id, word_count, mean_word_len, symbol_count, alpha_words,
       |  stopword_hits,
       |  (word_count >= 50 AND word_count <= 100000) AS ok_words,
       |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_len,
       |  (CAST(symbol_count AS DOUBLE) <= 0.1 * CAST(word_count AS DOUBLE))
       |    AS ok_symbols,
       |  (CAST(alpha_words AS DOUBLE) >= 0.8 * CAST(word_count AS DOUBLE))
       |    AS ok_alpha,
       |  (stopword_hits >= 2) AS ok_stopwords,
       |  ((word_count >= 50 AND word_count <= 100000)
       |   AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       |   AND (CAST(symbol_count AS DOUBLE) <= 0.1 * CAST(word_count AS DOUBLE))
       |   AND (CAST(alpha_words AS DOUBLE) >= 0.8 * CAST(word_count AS DOUBLE))
       |   AND (stopword_hits >= 2)) AS keep
       |FROM m""".stripMargin
  }
}
