package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair (DPO/RLHF-style) dataset builder — the
  * binarization step of modern preference-tuning pipelines: a pool of
  * candidate texts per prompt is ranked by a scalar quality score and
  * collapsed into (chosen, rejected) training pairs (the public
  * UltraFeedback / HH-style "binarize a ranked list" recipe). Here the
  * (lang, source) key stands in for the prompt pool over the synthetic
  * corpus, and the score is the integer quality signal
  * `alpha_chars + 2·distinct_tokens` — exact longs, so ranking,
  * margins, and the gate hash are deterministic cross-engine.
  *
  * Semantics: per pool, rank candidates (score desc, doc_id asc);
  * chosen ∈ top-`topK`, rejected ∈ bottom-`bottomK` (rank asc on the
  * mirrored order, doc_id desc tiebreak), keep pairs with
  * `chosen_score − rejected_score ≥ margin` and distinct doc ids, then
  * stamp the deterministic md5 train/test split on the PAIR key (both
  * members land in the same split — the leakage-safe choice).
  *
  * Scale shape: ONE shuffle on the pool key feeds both window ranks
  * (same partitioning, two sort orders); the pair join is top-k ×
  * bottom-k per pool — bounded k² fan-out, never |pool|² (the
  * association-rules basket-cap move). At 100 TB the pool key is the
  * prompt id with thousands of pools per partition; nothing touches
  * the driver.
  */
object PreferencePairs {

  /** Integer quality score: alphabetic chars + 2 × distinct
    * whitespace tokens. Exact longs in both engines. */
  private def scoreCol =
    (length(regexp_replace(col("text"), "[^A-Za-z]", "")) +
      lit(2) * size(array_distinct(split(col("text"), " ")))).cast("long")

  /** @return (lang, source, chosen_id, rejected_id, chosen_score,
    *         rejected_score, score_margin, split) one row per kept
    *         preference pair. */
  def pairs(docs: DataFrame, topK: Int = 2, bottomK: Int = 2,
      margin: Long = 5L, trainFrac: Double = 0.9): DataFrame = {
    require(topK >= 1 && bottomK >= 1,
      s"topK=$topK bottomK=$bottomK must be >= 1: the pair join is " +
        "bounded by topK x bottomK per pool")
    val scored = docs.select(col("lang"), col("source"),
      col("doc_id"), scoreCol.as("score"))
    val pool = Seq(col("lang"), col("source"))
    val hi = Window.partitionBy(pool: _*)
      .orderBy(col("score").desc, col("doc_id").asc)
    val lo = Window.partitionBy(pool: _*)
      .orderBy(col("score").asc, col("doc_id").desc)
    val ranked = scored
      .withColumn("rh", row_number().over(hi))
      .withColumn("rl", row_number().over(lo))
    val top = ranked.filter(col("rh") <= topK)
      .select(col("lang"), col("source"), col("doc_id").as("chosen_id"),
        col("score").as("chosen_score"))
    val bottom = ranked.filter(col("rl") <= bottomK)
      .select(col("lang"), col("source"), col("doc_id").as("rejected_id"),
        col("score").as("rejected_score"))
    top.join(bottom, Seq("lang", "source"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") - col("rejected_score") >= margin)
      .withColumn("score_margin", col("chosen_score") - col("rejected_score"))
      .withColumn("split",
        when(conv(substring(md5(concat(col("chosen_id").cast("string"),
            lit(":"), col("rejected_id").cast("string")).cast("binary")),
            1, 15), 16, 10).cast("long") <
            lit(math.floor(trainFrac * math.pow(2, 60)).toLong),
          "train").otherwise("test"))
      .select(col("lang"), col("source"), col("chosen_id"),
        col("rejected_id"), col("chosen_score"), col("rejected_score"),
        col("score_margin"), col("split"))
  }

  /** DuckDB mirror of [[pairs]]. */
  def pairsSql(topK: Int = 2, bottomK: Int = 2, margin: Long = 5L,
      trainFrac: Double = 0.9): String = {
    val thr = math.floor(trainFrac * math.pow(2, 60)).toLong
    s"""WITH scored AS (
       |  SELECT lang, source, doc_id,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
       |      + 2 * len(list_distinct(string_split(text, ' '))) AS BIGINT)
       |      AS score
       |  FROM documents),
       |ranked AS (
       |  SELECT lang, source, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY lang, source
       |                       ORDER BY score DESC, doc_id ASC) AS rh,
       |    ROW_NUMBER() OVER (PARTITION BY lang, source
       |                       ORDER BY score ASC, doc_id DESC) AS rl
       |  FROM scored)
       |SELECT t.lang, t.source, t.doc_id AS chosen_id,
       |  b.doc_id AS rejected_id, t.score AS chosen_score,
       |  b.score AS rejected_score, t.score - b.score AS score_margin,
       |  CASE WHEN CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR) || ':'
       |         || CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT) < $thr
       |       THEN 'train' ELSE 'test' END AS split
       |FROM (SELECT * FROM ranked WHERE rh <= $topK) t
       |JOIN (SELECT * FROM ranked WHERE rl <= $bottomK) b
       |  USING (lang, source)
       |WHERE t.doc_id <> b.doc_id AND t.score - b.score >= $margin""".stripMargin
  }
}
