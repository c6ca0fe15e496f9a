package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication — the span-granular complement
  * to the document/chunk/fuzzy dedup family (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * ExactSubstr): find every maximal region of text whose k-grams also
  * occur elsewhere in the corpus, keep the globally-first copy, and
  * cut the rest. Document-level dedup misses boilerplate shared by
  * otherwise-distinct pages; this operator removes exactly the
  * repeated characters and nothing else.
  *
  * Semantics (deterministic, oracle-checked):
  *  1. every character position `p` (1-based) of every doc yields the
  *     k-gram `substr(text, p, k)`;
  *  2. an occurrence is a DUPLICATE iff its gram appears ≥ 2 times in
  *     the corpus AND it is not the canonical (lexicographically first
  *     by (doc_id, pos)) occurrence of that gram — so one copy of any
  *     repeated region always survives;
  *  3. duplicate occurrences whose character ranges overlap or touch
  *     (gap ≤ k between start positions) merge into one maximal span
  *     `[span_start, span_end]`, end-inclusive.
  *
  * Scale shape: the corpus-wide step is ONE shuffle keyed by the gram
  * (count + row_number share the partitioning); the span merge is a
  * per-doc window over flagged positions only. The exact variant
  * shuffles k-char strings and is the oracle witness; the production
  * path is [[duplicatedSpansHashed]], which shuffles 8-byte Rabin-Karp
  * rolling hashes instead — position generation costs O(len) per doc,
  * not O(len·k) — and is gated against the SAME DuckDB oracle, so
  * hash-equality of the gate proves the hashed path lossless on the
  * test corpora (collision odds over m grams ≈ m²/2⁶⁴ < 1e-7 at sf0.1;
  * at 100 TB the mitigation is the standard one: verify candidate
  * spans against document bytes, which stays a broadcast-sized join of
  * span slices, never a corpus-wide string shuffle).
  *
  * The reference has no substring-level operator (its dedup is the
  * per-lap `drop_duplicates`, F1_Data_PreProcessing.ipynb:70); this is
  * part of the LLM-training-data extension surface.
  */
object SubstringDedup {

  /** Default gram width: ~the paper's 50-token threshold scaled to the
    * short synthetic docs (30 chars ≈ 6 words). */
  val DefaultK = 30

  /** Exact (doc_id, pos, gram) occurrence table, built entirely from
    * codegen'd built-ins (`sequence` + `explode` + `substr`). */
  private def exactPositions(docs: DataFrame, k: Int): DataFrame =
    docs.where(length(col("text")) >= k)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - lit(k - 1))).as("p"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        col("text").substr(col("p"), lit(k)).as("gram"))

  /** Rolling-hash (doc_id, pos, gram=hash64) occurrence table: one
    * narrow pass per doc, O(len) work, 8-byte shuffle key. The hash
    * loop is the native codegen'd
    * [[graft.functions.RollingHashGrams]] expression, so scan → hash →
    * explode fuse into one Tungsten stage with no object-encoder
    * boundary. Plain wrapping-Long polynomial hash (base 1000003) — a
    * hash, not a cryptographic commitment; see class doc for the
    * collision story. */
  private def hashedPositions(docs: DataFrame, k: Int): DataFrame = {
    graft.functions.RollingHashGrams.register(docs.sparkSession)
    docs.where(length(col("text")) >= k)
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(expr(s"rolling_hash_grams(text, $k)")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gram"))
  }

  /** Shared tail: flag non-canonical repeated occurrences, merge into
    * maximal spans. One gram-keyed shuffle, then doc-keyed windows over
    * the (small) flagged subset only. */
  private def spansFromPositions(pos: DataFrame, k: Int): DataFrame = {
    val byGram = Window.partitionBy("gram")
    val byGramOrd = byGram.orderBy("doc_id", "pos")
    val flagged = pos
      .withColumn("c", count(lit(1)).over(byGram))
      .withColumn("rn", row_number().over(byGramOrd))
      .where(col("c") >= 2 && col("rn") > 1)
      .select("doc_id", "pos")
    mergeFlagged(flagged, k)
  }

  /** Island-merge flagged (doc_id, pos) rows into maximal end-inclusive
    * spans (gap ≤ k fuses — character ranges overlap or touch). */
  private def mergeFlagged(flagged: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    flagged
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > k, 1).otherwise(0))
      .withColumn("g", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Maximal duplicated spans, exact-gram variant (oracle witness). */
  def duplicatedSpans(docs: DataFrame, k: Int = DefaultK): DataFrame =
    spansFromPositions(exactPositions(docs, k), k)

  /** Maximal duplicated spans, rolling-hash scale path. Gated against
    * the same oracle as [[duplicatedSpans]]. */
  def duplicatedSpansHashed(docs: DataFrame, k: Int = DefaultK): DataFrame =
    spansFromPositions(hashedPositions(docs, k), k)

  /** Per-doc duplication accounting over ALL docs (zero-filled):
    * span count, duplicated chars, and an integer-exact high-dup flag
    * (`dup_chars/n_chars > 1/5` spelled `5·dup_chars > n_chars` so the
    * gate never touches float division). Rides the hashed scale path by
    * default (`exact = true` switches to the witness variant); since
    * the gate's oracle derives from exact grams, its green hash ALSO
    * re-proves hashed ≡ exact through the stats rollup. */
  def dupStats(docs: DataFrame, k: Int = DefaultK,
      exact: Boolean = false): DataFrame = {
    val perDoc = (if (exact) duplicatedSpans(docs, k)
                  else duplicatedSpansHashed(docs, k))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + lit(1)).as("dup_chars"))
    docs.select(col("doc_id").cast("long").as("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "dup_chars"))
      .withColumn("high_dup", col("dup_chars") * 5 > col("n_chars"))
  }

  /** Cut every duplicated span out of every doc (the canonical copy of
    * each repeated region survives by construction — its positions are
    * never flagged). Spans are disjoint with ≥1 char between them
    * (islands merge at gap ≤ k), so the rebuild is a single left-to-
    * right fold: `aggregate` over the sorted span list carrying
    * (cursor, acc) — no UDF, payload strings never shuffle (the spans
    * side of the join is tiny). Hashed scale path by default, same
    * exact/hashed contract as [[dupStats]]. */
  def removeSpans(docs: DataFrame, k: Int = DefaultK,
      exact: Boolean = false): DataFrame = {
    val perDoc = (if (exact) duplicatedSpans(docs, k)
                  else duplicatedSpansHashed(docs, k))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(
        struct(col("span_start"), col("span_end")))).as("spans"))
    val text = col("text")
    val rebuilt = aggregate(
      col("spans"),
      struct(lit(1L).as("cur"), lit("").as("acc")),
      (st: Column, sp: Column) => struct(
        (sp("span_end") + 1).as("cur"),
        concat(st("acc"),
          text.substr(st("cur").cast("int"),
            (sp("span_start") - st("cur")).cast("int"))).as("acc")),
      (st: Column) => concat(st("acc"),
        text.substr(st("cur").cast("int"),
          (length(text) - st("cur") + 1).cast("int"))))
    docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("spans").isNull, col("text")).otherwise(rebuilt))
      .select("doc_id", "clean_text")
  }

  /** Default word-gram width for [[wordGramSpans]] — the paper's
    * granularity is tokens, not characters; 8 words ≈ its 50-BPE-token
    * threshold scaled to the short synthetic docs. */
  val DefaultWordK = 8

  /** Token-granularity variant (the paper's own coordinate system):
    * k-word sliding grams over the single-space token stream, same
    * canonical-first flagging and gap-≤-k island merge, spans in WORD
    * coordinates. Entirely built-ins (`split`/`transform`/`slice`/
    * `array_join` + `posexplode`), so the gram build stays inside one
    * codegen stage; the downstream is the shared one-shuffle tail.
    * Word-boundary alignment makes cuts splice cleanly at 100 TB
    * (char-mode spans can cut mid-word); char mode remains the
    * byte-exact witness. */
  def wordGramSpans(docs: DataFrame, k: Int = DefaultWordK): DataFrame = {
    val pos = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("w"))
      .where(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(w) - ${k - 1})," +
          s" i -> array_join(slice(w, i, $k), ' '))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gram"))
    spansFromPositions(pos, k)
      .select(col("doc_id"), col("span_start").as("span_start_w"),
        col("span_end").as("span_end_w"))
  }

  /** The persisted artifact of an ingested corpus: its distinct rolling
    * gram hashes. At 100 TB this is the table the daily batch probes —
    * written once, range-partitionable by hash, never re-derived from
    * history text. */
  def gramIndex(docs: DataFrame, k: Int = DefaultK): DataFrame =
    hashedPositions(docs, k).select("gram").distinct()

  /** Incremental face — duplicated spans of a NEW batch against an
    * already-ingested HISTORY, without touching history text. History
    * wins canonicality: a batch gram that exists in the index is
    * flagged at EVERY batch position; a batch-only gram keeps its
    * within-batch first occurrence. With history = all doc_ids below
    * the batch's, this is EXACTLY `duplicatedSpans(history ∪ batch)`
    * restricted to batch docs — which is what the gate's oracle checks.
    *
    * Scale shape (same routing contract as
    * [[IncrementalDedup.newOnly]]): the index is distilled once into a
    * broadcastable Bloom sketch ([[graft.functions.BloomFilterAgg]]),
    * batch positions stream through the codegen'd membership expr, and
    * only bloom-positive, not-already-flagged positions reach the
    * exact semi-join — the join carries the duplicate volume plus
    * ~fpp, never the batch volume. No false negatives, and the
    * semi-join verifies away false positives, so the result is exact. */
  def incrementalSpans(batch: DataFrame, historyIndex: DataFrame,
      expectedGrams: Long, k: Int = DefaultK,
      fpp: Double = 0.01): DataFrame = {
    val spark = batch.sparkSession
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.functions.BloomFilterAgg(expectedGrams, fpp),
      org.apache.spark.sql.Encoders.scalaLong)
    val bytes = historyIndex.agg(agg(col("gram")).as("bf"))
      .head().getAs[Array[Byte]](0)
    val fn = graft.functions.BloomMightContainLong.registerUnique(spark, bytes)
    val byGram = Window.partitionBy("gram")
    val byGramOrd = byGram.orderBy("doc_id", "pos")
    val marked = hashedPositions(batch, k)
      .withColumn("c", count(lit(1)).over(byGram))
      .withColumn("rn", row_number().over(byGramOrd))
    val batchDup = marked.where(col("c") >= 2 && col("rn") > 1)
      .select("doc_id", "pos")
    val histDup = marked
      .where(!(col("c") >= 2 && col("rn") > 1) && expr(s"$fn(gram)"))
      .join(historyIndex, Seq("gram"), "left_semi")
      .select("doc_id", "pos")
    mergeFlagged(batchDup.unionByName(histDup), k)
  }

  /** Publish-side composition: the span cut joined back to the corpus
    * dims and rolled up per lang — raw/clean/removed character
    * accounting in ONE lazy plan (scan → hashed spans → HOF rebuild →
    * broadcast-sized span join → aggregate), the dashboard a
    * substring-dedup run publishes. Gating this (clean_chars comes
    * from `length(clean_text)` of the REBUILT string, the oracle
    * derives it arithmetically from the span algebra) proves the
    * rebuild composes under joins and aggregation without a
    * materialization barrier. */
  def cleanRollup(docs: DataFrame, k: Int = DefaultK): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        length(col("text")).cast("long").as("raw_chars"))
      .join(removeSpans(docs, k), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_chars")).as("raw_chars"),
        sum(length(col("clean_text")).cast("long")).as("clean_chars"))
      .withColumn("removed_chars", col("raw_chars") - col("clean_chars"))

  // ---------------------------------------------------------------- oracles

  /** DuckDB spelling of steps 1-3 (scalar `range` + `unnest` builds the
    * position table; same window/island algebra as the engine). */
  def spansSql(k: Int = DefaultK): String =
    s"""WITH pos AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
       |         substr(text, CAST(p AS INT), $k) AS gram
       |  FROM (SELECT doc_id, text,
       |          unnest(range(1, 2 + length(text) - $k)) AS p
       |        FROM documents WHERE length(text) >= $k)),
       |flagged AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |           count(*) OVER (PARTITION BY gram) AS c,
       |           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |    FROM pos)
       |  WHERE c >= 2 AND rn > 1),
       |lagged AS (
       |  SELECT doc_id, pos,
       |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM flagged),
       |grp AS (
       |  SELECT doc_id, pos,
       |         sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |  FROM lagged)
       |SELECT doc_id, min(pos) AS span_start, max(pos) + ${k - 1} AS span_end
       |FROM grp GROUP BY doc_id, g""".stripMargin

  /** Oracle for [[dupStats]]: zero-filled per-doc rollup of the spans. */
  def dupStatsSql(k: Int = DefaultK): String =
    s"""WITH spans AS (${spansSql(k)}),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_spans,
       |         CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_chars
       |  FROM spans GROUP BY doc_id)
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       |       COALESCE(a.n_spans, 0) AS n_spans,
       |       COALESCE(a.dup_chars, 0) AS dup_chars,
       |       COALESCE(a.dup_chars, 0) * 5 > length(d.text) AS high_dup
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin

  /** DuckDB spelling of [[wordGramSpans]] (list slicing is 1-based
    * inclusive, so `words[p : p+k-1]` is Spark's `slice(w, p, k)`). */
  def wordGramSpansSql(k: Int = DefaultWordK): String =
    s"""WITH pos AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
       |         array_to_string(words[CAST(p AS INT):CAST(p + ${k - 1} AS INT)], ' ') AS gram
       |  FROM (SELECT doc_id,
       |          string_split(text, ' ') AS words,
       |          unnest(range(1, 2 + len(string_split(text, ' ')) - $k)) AS p
       |        FROM documents WHERE len(string_split(text, ' ')) >= $k)),
       |flagged AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |           count(*) OVER (PARTITION BY gram) AS c,
       |           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |    FROM pos)
       |  WHERE c >= 2 AND rn > 1),
       |lagged AS (
       |  SELECT doc_id, pos,
       |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM flagged),
       |grp AS (
       |  SELECT doc_id, pos,
       |         sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |  FROM lagged)
       |SELECT doc_id, min(pos) AS span_start_w, max(pos) + ${k - 1} AS span_end_w
       |FROM grp GROUP BY doc_id, g""".stripMargin

  /** Oracle for [[incrementalSpans]] with history = `doc_id < refMax`:
    * the FULL-corpus span computation restricted to batch docs (the
    * equivalence the incremental path must reproduce exactly — see its
    * scaladoc; history ids all precede batch ids, so corpus-wide
    * canonicality and history-wins coincide). */
  def incrementalSpansSql(refMax: Long, k: Int = DefaultK): String =
    s"""SELECT * FROM (${spansSql(k)}) WHERE doc_id >= $refMax"""

  /** Oracle for [[cleanRollup]]: per-lang rollup with clean_chars
    * derived arithmetically from the span algebra. */
  def cleanRollupSql(k: Int = DefaultK): String =
    s"""WITH spans AS (${spansSql(k)}),
       |agg AS (
       |  SELECT doc_id, CAST(SUM(span_end - span_start + 1) AS BIGINT)
       |         AS dup_chars
       |  FROM spans GROUP BY doc_id)
       |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(length(d.text)) AS BIGINT) AS raw_chars,
       |       CAST(SUM(length(d.text) - COALESCE(a.dup_chars, 0)) AS BIGINT)
       |         AS clean_chars,
       |       CAST(SUM(COALESCE(a.dup_chars, 0)) AS BIGINT) AS removed_chars
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |GROUP BY d.lang""".stripMargin

  /** Length invariant tying [[removeSpans]] to the span algebra:
    * `length(clean_text) = n_chars − dup_chars` for every doc. The
    * oracle never rebuilds the string — it derives the expected length
    * from the span rollup, so a cut that dropped or double-cut a
    * single character anywhere breaks the hash. */
  def cleanLenSql(k: Int = DefaultK): String =
    s"""WITH spans AS (${spansSql(k)}),
       |agg AS (
       |  SELECT doc_id, SUM(span_end - span_start + 1) AS dup_chars
       |  FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(length(d.text) - COALESCE(a.dup_chars, 0) AS BIGINT) AS clean_len
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin
}
