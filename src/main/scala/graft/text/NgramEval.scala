package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram-overlap generation eval — BLEU/ROUGE-n style CLIPPED-count
  * precision/recall over (candidate, reference) text pairs (Papineni
  * et al. BLEU modified precision; Lin ROUGE-n recall). The eval-side
  * twin of [[CorpusPipeline.contamination]] (r12 verdict item 8): the
  * same word-n-gram substrate, but counted WITH multiplicity and
  * clipped per gram — the metric a training-data team runs over model
  * generations vs references.
  *
  * Per pair, with c(g)/r(g) the gram multiplicities on each side:
  *   clipped   = Σ_g min(c(g), r(g))      (pure integer min/sum algebra)
  *   precision = clipped / Σ_g c(g)        (BLEU-n, no brevity penalty)
  *   recall    = clipped / Σ_g r(g)        (ROUGE-n)
  *
  * Scale shape: ONE text scan and TWO key shuffles, zero joins — the
  * pair id and side are pure arithmetic on doc_id, so both sides of a
  * pair meet in one (pair, gram) aggregation with conditional sums
  * (min(c, r) is 0 for any gram on one side only, so the clipped sum
  * needs no outer join), then one pair-level rollup. The gram text
  * never leaves the scan: xxhash64 is the 8-byte shuffle currency
  * (the oracle groups by md5 — only collision behavior must agree,
  * both ~0, the contamination convention). At 100 TB this is two
  * hash aggregations with map-side partial combine, nothing else.
  *
  * Pairing contract: candidate = even doc_id, reference = doc_id + 1
  * (Euclidean parity on both engines — the SQL spells pmod, so a
  * negative doc_id pairs identically); pairs missing either side (or
  * whose side has < n words) are dropped. The per-row double
  * divisions are exact-integer inputs through one IEEE divide —
  * bit-identical cross-engine.
  */
object NgramEval {

  def clippedOverlap(docs: DataFrame, n: Int = 2): DataFrame = {
    val perGram = docs
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= n)
      .select(
        (col("doc_id") - pmod(col("doc_id"), lit(2))).as("pair_id"),
        pmod(col("doc_id"), lit(2)).as("side"),
        explode(expr(Shingles.wordNgramsExpr("ws", n))).as("gram"))
      .select(col("pair_id"), col("side"), xxhash64(col("gram")).as("g"))
      .groupBy(col("pair_id"), col("g"))
      .agg(
        sum(when(col("side") === 0, 1L).otherwise(0L)).as("c_cnt"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("r_cnt"))
    perGram
      .groupBy(col("pair_id"))
      .agg(
        sum(least(col("c_cnt"), col("r_cnt"))).as("clipped"),
        sum(col("c_cnt")).as("c_total"),
        sum(col("r_cnt")).as("r_total"))
      .filter(col("c_total") > 0 && col("r_total") > 0)
      .select(col("pair_id"), col("clipped"), col("c_total"), col("r_total"),
        (col("clipped").cast("double") / col("c_total")).as("precision_n"),
        (col("clipped").cast("double") / col("r_total")).as("recall_n"))
  }

  /** DuckDB mirror of [[clippedOverlap]]. */
  def clippedOverlapSql(n: Int = 2, from: String = "documents"): String =
    s"""WITH nev_ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $from),
       |nev_grams AS (
       |  SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
       |         ((doc_id % 2) + 2) % 2 AS side,
       |         md5(array_to_string(ws[i:i+${n - 1}], ' ')) AS g
       |  FROM nev_ws, unnest(generate_series(1, len(ws) - ${n - 1})) t(i)
       |  WHERE len(ws) >= $n),
       |nev_pg AS (
       |  SELECT pair_id, g,
       |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM nev_grams GROUP BY 1, 2)
       |SELECT pair_id,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS DOUBLE) / SUM(c_cnt) AS precision_n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS DOUBLE) / SUM(r_cnt) AS recall_n
       |FROM nev_pg GROUP BY 1
       |HAVING SUM(c_cnt) > 0 AND SUM(r_cnt) > 0""".stripMargin
}
