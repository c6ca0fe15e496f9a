package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu et al. 2016 §4.1; the BERT tokenizer's
  * greedy variant, Devlin et al. 2019): per word, repeatedly take the
  * LONGEST vocabulary piece matching at the cursor — continuation
  * pieces carry the `##` prefix — and emit `[UNK]` for the whole word
  * when no piece matches. Third tokenizer family next to the gated BPE
  * (merge ranks) and unigram-LM (Viterbi): WordPiece is longest-match
  *-first, which neither of those reduces to.
  *
  * Vocabulary (deterministic, corpus-derived, bounded — vocab
  * LIKELIHOOD learning is out of scope exactly as BPE's merge learning
  * is bounded to its gated rounds): every single character in both
  * start and `##` form (so `[UNK]` never fires on in-corpus text —
  * the BERT property), the `topWords` most frequent whole words, and
  * the `topPrefixes` most frequent 3-char word prefixes, ties broken
  * lexicographically.
  *
  * Execution shape: the vocab is two bounded top-k aggregates + a
  * char-set aggregate collapsed to ONE broadcast array row; encoding
  * is a stateless whole-stage-codegen projection — the greedy loop is
  * a higher-order `aggregate` fold over the word's character budget
  * (each step consumes ≥ 1 char, so `length(w)` iterations bound it),
  * with the longest match found by `filter` over DESCENDING candidate
  * lengths. No UDF, no shuffle of the corpus, no driver loop. The
  * DuckDB oracle unrolls the same fold as chained CTE steps (the
  * TextRank fixed-iteration pattern) — exact because every operation
  * is string/integer.
  */
object WordPiece {

  val MaxPieceLen = 8

  /** 1-row vocab frame: (vocab array<string>). */
  def buildVocab(docs: DataFrame, topWords: Int = 64,
      topPrefixes: Int = 32): DataFrame = {
    // empty words (leading/trailing/double spaces) carry no pieces and
    // must not leak '' into the vocab (Spark's sequence(1, 0) is the
    // DESCENDING [1, 0], not empty — it would manufacture '' chars)
    // vocab-bounded word-frequency table, pinned: top words, top
    // prefixes, AND the char alphabet all derive from it (the distinct
    // char set of distinct words ≡ that of all words), so the corpus
    // explode runs once instead of three times (scan census: 5 → 2
    // source scans on the encode gate)
    val wordFreq = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val topW = wordFreq
      .orderBy(col("c").desc, col("w")).limit(topWords).select(col("w").as("p"))
    val topP = wordFreq.filter(length(col("w")) >= 4)
      .select(substring(col("w"), 1, 3).as("p"), col("c"))
      .groupBy("p").agg(sum(col("c")).as("c"))
      .orderBy(col("c").desc, col("p")).limit(topPrefixes).select("p")
    // ≤ alphabet-sized, pinned because the plain and ##-prefixed arms
    // would otherwise re-run the distinct over the word table
    val chars0 = wordFreq.select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("ch"))
      .distinct()
      .localCheckpoint(true)
    val chars = chars0.select(col("ch").as("p"))
      .union(chars0.select(concat(lit("##"), col("ch")).as("p")))
    topW.union(topP).union(chars).distinct()
      .agg(sort_array(collect_list(col("p"))).as("vocab"))
  }

  /** The greedy fold over one word column `w` with vocab column
    * `vocab`; yields the piece array.
    *
    * Cost shape (this made the gate 10× cheaper at sf0.1): an
    * in-vocab word short-circuits to `array(w)` with ONE membership
    * probe — identical to the fold's result, because greedy's FIRST
    * candidate at pos=1 is the whole word (guarded to ≤ MaxPieceLen);
    * and inside the fold the candidate list is bound ONCE per step via
    * a single-element `transform` (SQL lambdas have no let), instead
    * of being re-evaluated for the emptiness test and the head take. */
  private def tokenizeExpr: String = {
    // longest candidate length at the cursor: filter DESCENDING
    // lengths by vocab membership, take the head
    val cands =
      s"""filter(sequence(least($MaxPieceLen, length(w) - st.pos + 1), 1, -1),
         |  l -> array_contains(vocab, IF(st.pos = 1,
         |    substring(w, st.pos, l), concat('##', substring(w, st.pos, l)))))"""
        .stripMargin
    s"""IF(length(w) = 0,
       |  CAST(array() AS array<string>),
       |IF(length(w) <= $MaxPieceLen AND array_contains(vocab, w),
       |  array(w),
       |  aggregate(
       |    sequence(1, length(w)),
       |    named_struct('pos', 1, 'ps', CAST(array() AS array<string>),
       |                 'unk', false),
       |    (st, it) -> IF(st.unk OR st.pos > length(w), st,
       |      element_at(transform(array($cands), cs ->
       |        IF(size(cs) = 0,
       |           named_struct('pos', length(w) + 1, 'ps', st.ps, 'unk', true),
       |           named_struct(
       |             'pos', st.pos + element_at(cs, 1),
       |             'ps', array_append(st.ps, IF(st.pos = 1,
       |               substring(w, st.pos, element_at(cs, 1)),
       |               concat('##', substring(w, st.pos, element_at(cs, 1))))),
       |             'unk', false))), 1)),
       |    st -> IF(st.unk, array('[UNK]'), st.ps))))""".stripMargin
  }

  /** Per-doc encoding digest: (doc_id, n_words, n_pieces, n_unk,
    * pieces_md5) where pieces_md5 hashes the space-joined piece
    * stream — pinning the exact piece sequence without row bloat. */
  def encode(docs: DataFrame, topWords: Int = 64,
      topPrefixes: Int = 32): DataFrame =
    encodeWithVocab(docs, buildVocab(docs, topWords, topPrefixes))

  /** Encode against an explicit 1-row (vocab array<string>) frame —
    * the seam the specs drive with hand vocabularies. */
  def encodeWithVocab(docs: DataFrame, vocab: DataFrame): DataFrame = {
    docs.crossJoin(broadcast(vocab))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("pieces",
        expr(s"flatten(transform(ws, w -> $tokenizeExpr))"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(col("pieces")).cast("long").as("n_pieces"),
        expr("size(filter(pieces, p -> p = '[UNK]'))").cast("long").as("n_unk"),
        md5(concat_ws(" ", col("pieces")).cast("binary")).as("pieces_md5"))
  }

  /** Per-language tokenizer fertility — the standard tokenizer-eval
    * rollup (pieces per word) plus UNK share, computed from the real
    * encoder output: a tokenizer trained on one language mix
    * over-fragments the others, and this is the table that shows it
    * before a training run pays for it in effective context length.
    * Output: (lang, n_docs, sum_words, sum_pieces, sum_unk,
    * fertility, unk_share).
    *
    * Exactness: the ratios are single IEEE divides of exact long
    * sums — bit-identical cross-engine. Scale shape: rides [[encode]]
    * (embarrassingly parallel fold) + one lang-keyed aggregate. */
  def fertility(docs: DataFrame, topWords: Int = 64,
      topPrefixes: Int = 32): DataFrame =
    encode(docs, topWords, topPrefixes)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        sum(col("n_pieces")).as("sum_pieces"),
        sum(col("n_unk")).as("sum_unk"))
      .withColumn("fertility",
        col("sum_pieces").cast("double") / col("sum_words").cast("double"))
      .withColumn("unk_share",
        col("sum_unk").cast("double") / col("sum_pieces").cast("double"))

  /** DuckDB mirror of [[fertility]] — wraps [[encodeSql]] verbatim. */
  def fertilitySql(topWords: Int = 64, topPrefixes: Int = 32): String =
    s"""SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(e.n_words) AS BIGINT) AS sum_words,
       |  CAST(SUM(e.n_pieces) AS BIGINT) AS sum_pieces,
       |  CAST(SUM(e.n_unk) AS BIGINT) AS sum_unk,
       |  CAST(SUM(e.n_pieces) AS DOUBLE) / CAST(SUM(e.n_words) AS DOUBLE)
       |    AS fertility,
       |  CAST(SUM(e.n_unk) AS DOUBLE) / CAST(SUM(e.n_pieces) AS DOUBLE)
       |    AS unk_share
       |FROM (${encodeSql(topWords, topPrefixes)}) e
       |JOIN documents d USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** Detokenization roundtrip: rebuild each document from its piece
    * stream (strip `##`, concat within word, join words) — WordPiece
    * with a char-complete vocab is lossless, so the rebuilt text
    * hash-equals the original. The oracle is just md5(text) from the
    * source table: the ENGINE does encode∘decode, the oracle pins the
    * identity (the s9 codec-roundtrip pattern). */
  def roundtrip(docs: DataFrame, topWords: Int = 64,
      topPrefixes: Int = 32): DataFrame =
    roundtripWithVocab(docs, buildVocab(docs, topWords, topPrefixes))

  /** Roundtrip against an explicit vocab — the UNK-fallback test seam. */
  def roundtripWithVocab(docs: DataFrame, vocab: DataFrame): DataFrame = {
    docs.crossJoin(broadcast(vocab))
      .withColumn("ws", split(col("text"), " "))
      // a word that tokenized to [UNK] cannot be rebuilt from pieces;
      // fall back to the raw word so the identity stays total (on the
      // corpus vocab UNK never fires — chars are complete — but the
      // op must not silently corrupt foreign text). The piece array is
      // bound ONCE per word (single-element transform) — tokenizing
      // twice doubled the gate cost before.
      .withColumn("rebuilt", expr(
        s"""array_join(transform(ws, w ->
           |  element_at(transform(array($tokenizeExpr), ps ->
           |    CASE WHEN element_at(ps, 1) = '[UNK]' THEN w
           |         ELSE replace(array_join(ps, ''), '##', '') END), 1)),
           |  ' ')""".stripMargin))
      .select(col("doc_id"),
        md5(col("rebuilt").cast("binary")).as("roundtrip_md5"))
  }

  def roundtripSql: String =
    "SELECT doc_id, md5(text) AS roundtrip_md5 FROM documents"

  /** DuckDB mirror: identical vocab, the fold unrolled as `MaxPieceLen`
    * chained projection steps per word (each consumes ≥1 char, which
    * finishes every word of ≤ `MaxPieceLen` chars — the corpus bound).
    * A LONGER word can exit s$MaxPieceLen unfinished (pos ≤ length(w),
    * unk = false); the final `toks` CTE maps that state to `[UNK]`, so
    * a corpus that violates the bound fails LOUDLY in the gate (n_unk
    * and pieces_md5 both diverge from the Spark fold, which runs the
    * full length(w) iterations) instead of silently truncating the
    * piece stream. Empty words carry zero pieces in both engines. */
  def encodeSql(topWords: Int = 64, topPrefixes: Int = 32): String = {
    val candsExpr =
      s"""list_filter(generate_series(least($MaxPieceLen, length(w) - pos + 1), 1, -1),
         |    l -> list_contains(vocab, CASE WHEN pos = 1 THEN substr(w, pos, l)
         |         ELSE '##' || substr(w, pos, l) END))""".stripMargin
    def step(i: Int): String =
      s"""s$i AS (
         |  SELECT doc_id, wid, w, vocab,
         |    CASE WHEN unk OR pos > length(w) THEN pos
         |         WHEN cand IS NULL THEN length(w) + 1
         |         ELSE pos + cand END AS pos,
         |    CASE WHEN unk OR pos > length(w) THEN ps
         |         WHEN cand IS NULL THEN ps
         |         WHEN ps = '' THEN piece
         |         ELSE ps || ' ' || piece END AS ps,
         |    CASE WHEN unk THEN true
         |         WHEN pos <= length(w) AND cand IS NULL THEN true
         |         ELSE false END AS unk
         |  FROM (
         |    SELECT *, ($candsExpr)[1] AS cand,
         |      CASE WHEN pos = 1 THEN substr(w, pos, ($candsExpr)[1])
         |           ELSE '##' || substr(w, pos, ($candsExpr)[1]) END AS piece
         |    FROM s${i - 1}))""".stripMargin
    s"""WITH wf AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) > 0
       |  GROUP BY 1),
       |topw AS (SELECT w AS p FROM wf ORDER BY c DESC, w LIMIT $topWords),
       |topp AS (
       |  SELECT p FROM (
       |    SELECT substr(w, 1, 3) AS p, SUM(c) AS c FROM wf
       |    WHERE length(w) >= 4 GROUP BY 1)
       |  ORDER BY c DESC, p LIMIT $topPrefixes),
       |chars AS (
       |  SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS ch
       |  FROM wf, unnest(generate_series(1, length(w))) t(i)),
       |vocab AS (
       |  SELECT list_sort(list(DISTINCT p)) AS vocab FROM (
       |    SELECT p FROM topw UNION SELECT p FROM topp
       |    UNION SELECT ch FROM chars UNION SELECT '##' || ch FROM chars)),
       |wrds AS (
       |  SELECT doc_id, CAST(i AS INT) AS wid, ws[CAST(i AS INT)] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |       unnest(generate_series(1, len(ws))) t(i)),
       |s0 AS (
       |  SELECT wrds.doc_id, wrds.wid, wrds.w, v.vocab,
       |    1 AS pos, '' AS ps, false AS unk
       |  FROM wrds CROSS JOIN vocab v),
       |${(1 to MaxPieceLen).map(step).mkString(",\n")},
       |toks AS (
       |  -- pos <= length(w) after the last step = word did not finish
       |  -- inside the unroll bound -> UNK (loud divergence from the
       |  -- Spark fold, which always finishes); length(w) = 0 = empty
       |  -- word -> zero pieces (NULL wps is skipped by string_agg)
       |  SELECT doc_id, wid,
       |    CASE WHEN length(w) = 0 THEN NULL
       |         WHEN unk OR pos <= length(w) THEN '[UNK]' ELSE ps END AS wps,
       |    CASE WHEN length(w) = 0 THEN 0
       |         WHEN unk OR pos <= length(w) THEN 1
       |         ELSE len(string_split(ps, ' ')) END AS np,
       |    CASE WHEN length(w) = 0 THEN 0
       |         WHEN unk OR pos <= length(w) THEN 1 ELSE 0 END AS nu
       |  FROM s$MaxPieceLen)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nu) AS BIGINT) AS n_unk,
       |  md5(COALESCE(string_agg(wps, ' ' ORDER BY wid), '')) AS pieces_md5
       |FROM toks GROUP BY 1""".stripMargin
  }
}
