package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-table entity resolution (record linkage): find, for every probe
  * record, its best fuzzy match in a reference table — the cross-TABLE
  * twin of [[graft.text.FuzzyDedup]]'s within-corpus dedup, and the op
  * that reconciles a re-crawled/vendor-delivered entity list against
  * the canonical dimension at ingest.
  *
  * Shape (Fellegi–Sunter blocking + bounded scoring):
  *  1. '''Block''': candidates must share the exact block columns AND
  *     sit within ±1 length band (band = len div `bandWidth`). Since
  *     edit distance ≤ maxEdit bounds the length gap by maxEdit, a
  *     band width > maxEdit guarantees NO true match is lost — the
  *     blocking is lossless by construction, not a recall gamble. The
  *     probe side explodes to its 3 candidate bands (3× a table is
  *     free; candidate pairs collapse from n·m to Σ block sizes).
  *  2. '''Score''': `levenshtein(nameL, nameR) <= maxEdit` — the
  *     injected BandLevenshteinPredicate rule rewrites this to the
  *     banded O(len·maxEdit) form automatically.
  *  3. '''Resolve''': best match per probe = lowest distance, ties to
  *     the smallest reference key (total order), via one keyed window.
  *
  * Oracle-exact: integer edit distances, integer bands, deterministic
  * tiebreaks — the whole result hash-matches DuckDB running the same
  * blocking algebra (spelled as a band BETWEEN range join there).
  */
object RecordLinkage {

  /** @param probe     records to resolve: `probeKey`, `nameCol`, blocks
    * @param reference canonical records: `refKey`, `nameCol`, blocks
    * @param blockCols exact-match blocking columns (both sides)
    * @param bandWidth length-band width; must be > maxEdit for
    *                  lossless blocking
    * @return (probe_key, ref_key, probe_name, ref_name, edit_dist) —
    *         at most one row per probe (unmatched probes are absent) */
  def bestMatch(probe: DataFrame, reference: DataFrame, probeKey: String,
      refKey: String, nameCol: String, blockCols: Seq[String],
      maxEdit: Int, bandWidth: Int = 4): DataFrame = {
    require(bandWidth > maxEdit, "bandWidth must exceed maxEdit for lossless blocking")
    val l = probe.select(
      col(probeKey).as("probe_key") +: col(nameCol).as("probe_name") +:
        blockCols.map(c => col(c).as(s"_b_$c")): _*)
      .withColumn("_band",
        explode(array(expr(s"length(probe_name) div $bandWidth") - 1,
          expr(s"length(probe_name) div $bandWidth"),
          expr(s"length(probe_name) div $bandWidth") + 1)))
    val r = reference.select(
      col(refKey).as("ref_key") +: col(nameCol).as("ref_name") +:
        blockCols.map(c => col(c).as(s"_b_$c")): _*)
      .withColumn("_band", expr(s"length(ref_name) div $bandWidth"))
    val joined = l.join(r, blockCols.map(c => s"_b_$c") :+ "_band")
      .withColumn("edit_dist", levenshtein(col("probe_name"), col("ref_name")))
      .filter(col("edit_dist") <= maxEdit)
    val w = Window.partitionBy(col("probe_key"))
      .orderBy(col("edit_dist"), col("ref_key"))
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("probe_key"), col("ref_key"), col("probe_name"),
        col("ref_name"), col("edit_dist"))
  }

  /** DuckDB mirror of [[bestMatch]] (the band explode spelled as a
    * BETWEEN range join — same algebra). */
  def bestMatchSql(probeSql: String, refSql: String, probeKey: String,
      refKey: String, nameCol: String, blockCols: Seq[String],
      maxEdit: Int, bandWidth: Int = 4): String = {
    val blockEq = blockCols.map(c => s"l.$c = r.$c").mkString(" AND ")
    s"""WITH l AS ($probeSql), r AS ($refSql),
       |cand AS (
       |  SELECT l.$probeKey AS probe_key, r.$refKey AS ref_key,
       |    l.$nameCol AS probe_name, r.$nameCol AS ref_name,
       |    levenshtein(l.$nameCol, r.$nameCol) AS edit_dist
       |  FROM l JOIN r ON $blockEq
       |    AND length(r.$nameCol) // $bandWidth
       |        BETWEEN length(l.$nameCol) // $bandWidth - 1
       |            AND length(l.$nameCol) // $bandWidth + 1
       |  WHERE levenshtein(l.$nameCol, r.$nameCol) <= $maxEdit),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_key
       |    ORDER BY edit_dist, ref_key) AS rn
       |  FROM cand)
       |SELECT probe_key, ref_key, probe_name, ref_name, edit_dist
       |FROM ranked WHERE rn = 1""".stripMargin
  }
}
