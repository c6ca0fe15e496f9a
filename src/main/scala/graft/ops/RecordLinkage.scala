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
  * Shape (Fellegi–Sunter blocking, q-gram prefix-filter candidates):
  *  1. '''Block''': candidates must share the exact block columns.
  *  2. '''Candidates, losslessly''': two strings within edit distance
  *     e share ≥ max(len)−q+1−e·q q-grams, so (prefix-filter family,
  *     same algebra as Shingles.prefixFilter) each record keeps only
  *     its e·q+1 RAREST grams under a global (df, gram) order and
  *     candidate pairs must collide on one of them — the ubiquitous
  *     grams (shared template prefixes like "Customer#") rank last
  *     and never generate pairs, which is what collapses the n·m
  *     block cross-product. A record below the pigeonhole bound
  *     (distinct-gram count ≤ e·q — short OR degenerately repetitive)
  *     instead pairs against its whole block, so the candidate set
  *     stays exactly lossless.
  *  3. '''Score''': length pre-filter, then the 3-arg BANDED
  *     levenshtein (O(len·e) per pair, −1-past-bound doubles as the
  *     filter) — only on the collided candidates.
  *  4. '''Resolve''': best match per probe = lowest distance, ties to
  *     the smallest reference key, via one keyed window.
  *
  * Oracle-exact: integer edit distances and deterministic tiebreaks;
  * the DuckDB mirror scores every in-block pair directly (candidate
  * generation is lossless, so the results coincide — the same
  * "exactness witness" pattern as dedup_prefix_filter).
  */
object RecordLinkage {

  /** @param probe     records to resolve: `probeKey`, `nameCol`, blocks
    * @param reference canonical records: `refKey`, `nameCol`, blocks
    * @param blockCols exact-match blocking columns (both sides)
    * @param q         gram width for the prefix filter
    * @return (probe_key, ref_key, probe_name, ref_name, edit_dist) —
    *         at most one row per probe (unmatched probes are absent) */
  def bestMatch(probe: DataFrame, reference: DataFrame, probeKey: String,
      refKey: String, nameCol: String, blockCols: Seq[String],
      maxEdit: Int, q: Int = 3): DataFrame = {
    val prefixLen = maxEdit * q + 1
    val blocks = blockCols.map(c => s"_b_$c")

    val l = probe.select(
      col(probeKey).as("probe_key") +: col(nameCol).as("probe_name") +:
        blockCols.map(c => col(c).as(s"_b_$c")): _*)
    val r = reference.select(
      col(refKey).as("ref_key") +: col(nameCol).as("ref_name") +:
        blockCols.map(c => col(c).as(s"_b_$c")): _*)

    def grams(df: DataFrame, keyCol: String, nc: String) = df
      .select(col(keyCol) +: col(nc).as("_nm") +: blocks.map(col): _*)
      .select(col(keyCol) +: blocks.map(col) :+
        explode(expr(
          s"""array_distinct(transform(
             |  sequence(1, greatest(1, length(_nm) - $q + 1)),
             |  i -> substring(_nm, i, $q)))""".stripMargin)).as("gram"): _*)

    val lg = grams(l, "probe_key", "probe_name")
    val rg = grams(r, "ref_key", "ref_name")

    // One global rarity order shared by both sides. The q-gram
    // vocabulary is alphabet-bounded (≤ |Σ|^q distinct grams — a few
    // thousand here, 1110 measured on the gate corpus), so for small q
    // the df table BROADCASTS and the rarity lookup costs no shuffle;
    // larger q falls back to the shuffle join rather than risk an
    // oversized broadcast.
    val dfRaw = lg.select(col("gram")).unionByName(rg.select(col("gram")))
      .groupBy(col("gram")).agg(count(lit(1)).as("_df"))
    val df_ = if (q <= 3) broadcast(dfRaw) else dfRaw
    // Prefix selection AND the per-record gram count ride the SAME
    // keyed shuffle: _gc as an unordered window over the partition the
    // row_number already established — replaces the earlier separate
    // gcL/gcR aggregates + joins (two shuffles per side gone).
    def prefixOf(g: DataFrame, keyCol: String) = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("_df"), col("gram"))
      g.join(df_, "gram")
        .withColumn("_pr", row_number().over(w))
        .withColumn("_gc", count(lit(1)).over(Window.partitionBy(col(keyCol))))
        .filter(col("_pr") <= prefixLen)
        .select(col(keyCol) +: col("gram") +: col("_gc") +: blocks.map(col): _*)
    }
    val lp = prefixOf(lg, "probe_key").localCheckpoint(true)
    val rp = prefixOf(rg, "ref_key").localCheckpoint(true)

    val gramCands = lp.drop("_gc")
      .join(rp.drop("_gc"), "gram" +: blocks)
      .select("probe_key", "ref_key")
    // pigeonhole needs |grams| > e·q on BOTH sides; a record below that
    // (short or degenerately repetitive) pairs against its whole block.
    // The short-key sets come from the checkpointed prefix frames (the
    // _gc column), not a recount of the gram stream.
    val shortL = lp.filter(col("_gc") <= maxEdit * q)
      .select(col("probe_key") +: blocks.map(col): _*).distinct()
      .join(r.select(col("ref_key") +: blocks.map(col): _*), blocks)
      .select("probe_key", "ref_key")
    val shortR = rp.filter(col("_gc") <= maxEdit * q)
      .select(col("ref_key") +: blocks.map(col): _*).distinct()
      .join(l.select(col("probe_key") +: blocks.map(col): _*), blocks)
      .select("probe_key", "ref_key")
    val candidates = gramCands.unionByName(shortL).unionByName(shortR)
      .distinct()

    val joined = candidates
      .join(l.select(col("probe_key"), col("probe_name")), Seq("probe_key"))
      .join(r.select(col("ref_key"), col("ref_name")), Seq("ref_key"))
      .filter(abs(length(col("probe_name")) - length(col("ref_name"))) <= maxEdit)
      .withColumn("edit_dist",
        expr(s"levenshtein(probe_name, ref_name, $maxEdit)"))
      .filter(col("edit_dist") >= 0)
    val w = Window.partitionBy(col("probe_key"))
      .orderBy(col("edit_dist"), col("ref_key"))
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("probe_key"), col("ref_key"), col("probe_name"),
        col("ref_name"), col("edit_dist"))
  }

  /** DuckDB mirror of [[bestMatch]]: scores every in-block pair
    * directly — hash-equality with the engine proves the prefix-filter
    * candidate generation lossless. */
  def bestMatchSql(probeSql: String, refSql: String, probeKey: String,
      refKey: String, nameCol: String, blockCols: Seq[String],
      maxEdit: Int): String = {
    val blockEq = blockCols.map(c => s"l.$c = r.$c").mkString(" AND ")
    s"""WITH l AS ($probeSql), r AS ($refSql),
       |cand AS (
       |  SELECT l.$probeKey AS probe_key, r.$refKey AS ref_key,
       |    l.$nameCol AS probe_name, r.$nameCol AS ref_name,
       |    levenshtein(l.$nameCol, r.$nameCol) AS edit_dist
       |  FROM l JOIN r ON $blockEq
       |  WHERE abs(length(l.$nameCol) - length(r.$nameCol)) <= $maxEdit
       |    AND levenshtein(l.$nameCol, r.$nameCol) <= $maxEdit),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_key
       |    ORDER BY edit_dist, ref_key) AS rn
       |  FROM cand)
       |SELECT probe_key, ref_key, probe_name, ref_name, edit_dist
       |FROM ranked WHERE rn = 1""".stripMargin
  }
}
