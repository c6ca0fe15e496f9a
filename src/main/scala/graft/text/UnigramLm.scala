package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training (Kudo 2018, the
  * SentencePiece unigram model) — the OTHER production subword
  * tokenizer, complementing [[Bpe]]: BPE grows a vocab bottom-up by
  * merging, unigram starts from an over-complete substring vocabulary
  * and fits piece probabilities by EM, segmenting with Viterbi.
  *
  * Scale shape (the part that matters at 10¹³ corpus tokens):
  *  - Everything runs over the DISTINCT-WORD frame (vocab-sized, Zipf:
  *    orders of magnitude smaller than the corpus), weighted by word
  *    frequency — the same compaction Bpe.learnMerges rides.
  *  - Seed-vocab candidate generation explodes substrings of distinct
  *    words only, aggregates (substring → weighted freq) in one
  *    shuffle, and takes the top-S via a deterministic global top-k.
  *  - Each EM iteration is: broadcast the (≤ vocabSize, bounded
  *    artifact — the model being trained, like Bpe's merge table) score
  *    map; one narrow mapPartitions runs per-word Viterbi (O(len ·
  *    maxPieceLen) each); one groupBy folds expected counts. No row
  *    ever leaves its partition except the piece-count aggregation.
  *  - Floats: piece scores are log-probs quantized to 1e-9 units
  *    (integer longs) before broadcast, so the Viterbi argmax compares
  *    LONG sums — bit-deterministic across runs, partitionings, and
  *    JVMs; ties break on fewer-pieces-then-latest-final-cut (the
  *    largest last piece wins among equal-score, equal-length
  *    segmentations), making the segmentation total.
  *
  * The EM iteration itself is float-seeded (ln of count ratios), so the
  * trained table carries no cross-engine SQL oracle — same class as the
  * ANN/sketch gates; UnigramLmSpec anchors it with coverage/roundtrip
  * invariants and a hand-checkable toy corpus instead.
  */
object UnigramLm {

  /** Quantize a log-prob to integer 1e-9 units (floor — exact-integer
    * comparisons from then on). */
  private def q9(x: Double): Long = math.floor(x * 1e9).toLong

  /** Distinct words with frequencies from whitespace-tokenized docs. */
  private[text] def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Over-complete seed vocabulary: all substrings of length ≤
    * `maxPieceLen` of distinct words, weighted by word freq; the top
    * `seedSize` by (weight, piece) PLUS every single character (the
    * coverage floor that keeps Viterbi total). */
  private[text] def seedVocab(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): DataFrame = {
    val subs = words.select(col("freq"),
      explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})),
           |    j -> substring(word, i, j - i + 1))))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("w"))
    val chars = subs.where(length(col("piece")) === 1)
    val multi = subs.where(length(col("piece")) > 1)
      .orderBy(col("w").desc, col("piece")).limit(seedSize)
    chars.unionByName(multi)
  }

  /** One Viterbi segmentation of `word` under quantized scores.
    * Maximizes Σ score; ties prefer FEWER pieces, then the latest
    * final cut — a deterministic total order on segmentations. */
  private[text] def viterbi(word: String, score: collection.Map[String, Long],
      maxPieceLen: Int): List[String] = {
    val n = word.length
    // best(i): (score, pieces, path) for prefix [0, i)
    val bestScore = Array.fill(n + 1)(Long.MinValue)
    val bestLen = Array.fill(n + 1)(Int.MaxValue)
    val bestCut = Array.fill(n + 1)(-1)
    bestScore(0) = 0L; bestLen(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (bestScore(i) != Long.MinValue) {
          score.get(word.substring(i, j)) match {
            case Some(s) =>
              val cand = bestScore(i) + s
              val candLen = bestLen(i) + 1
              val better = cand > bestScore(j) ||
                (cand == bestScore(j) && (candLen < bestLen(j) ||
                  (candLen == bestLen(j) && i > bestCut(j))))
              if (better) {
                bestScore(j) = cand; bestLen(j) = candLen; bestCut(j) = i
              }
            case None =>
          }
        }
        i += 1
      }
      j += 1
    }
    // single-char floor guarantees reachability
    var out = List.empty[String]
    var p = n
    while (p > 0) { val c = bestCut(p); out = word.substring(c, p) :: out; p = c }
    out
  }

  /** The EM loop shared by [[train]] (production float-ln scores) and
    * [[trainQ]] (the fixed-point integer-log2 oracle twin): seed →
    * `iters` rounds of Viterbi hard-E-step over the weighted word
    * frame, count-fold M-step, prune to `vocabSize` by (count, piece)
    * keeping all single chars — with piece scores from
    * `scoreFn(count, totalCount)`. Returns the final score map.
    *
    * Driver-materialization contract: the ONLY collects are the model
    * artifact itself — ≤ max(seedSize, vocabSize) + |alphabet| rows per
    * EM round (the table being broadcast back out, exactly like Bpe's
    * merge list). Both knobs are hard-capped at 1,000,000 pieces so the
    * bound is explicit rather than caller-trusted; a 10⁶-piece model is
    * ~50 MB broadcast, far beyond any published subword vocab. */
  private def trainWith(docs: DataFrame, vocabSize: Int, maxPieceLen: Int,
      iters: Int, seedSize: Int,
      scoreFn: (Long, Long) => Long): Map[String, Long] = {
    require(seedSize > 0 && seedSize <= 1000000,
      s"seedSize=$seedSize outside (0, 1e6]: the seed vocab is collected " +
        "to the driver as the model artifact and must stay bounded")
    require(vocabSize > 0 && vocabSize <= 1000000,
      s"vocabSize=$vocabSize outside (0, 1e6]: the trained vocab is " +
        "collected to the driver as the model artifact and must stay bounded")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs).as[(String, Long)].cache()

    // init scores from seed weights
    val seed = seedVocab(words.toDF(), maxPieceLen, seedSize)
      .as[(String, Long)].collect()
    var total = seed.map(_._2).sum
    var score: Map[String, Long] =
      seed.map { case (p, w) => p -> scoreFn(w, total) }.toMap

    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(score)
      val mpl = maxPieceLen
      val counts = words.mapPartitions { rows =>
        val sc = bc.value
        rows.flatMap { case (w, f) =>
          viterbi(w, sc, mpl).groupBy(identity)
            .map { case (p, ps) => (p, ps.size.toLong * f) }
        }
      }.toDF("piece", "cnt")
        .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
      val chars = counts.where(length(col("piece")) === 1)
      val multi = counts.where(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
      val kept = chars.unionByName(multi).as[(String, Long)].collect()
      total = kept.map(_._2).sum
      score = kept.map { case (p, c) => p -> scoreFn(c, total) }.toMap
      bc.unpersist()
      it += 1
    }
    words.unpersist()
    score
  }

  /** Train: the production model — scores q9(ln(count/total)).
    * @return (piece, q9_logp, logp) — the shipped tokenizer model */
  def train(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      iters: Int = 3, seedSize: Int = 4000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fin = trainWith(docs, vocabSize, maxPieceLen, iters, seedSize,
      (c, t) => q9(math.log(c / t.toDouble))).toSeq
    spark.createDataset(fin).toDF("piece", "q9_logp")
      .withColumn("logp", col("q9_logp").cast("double") / 1e9)
      .orderBy(col("q9_logp").desc, col("piece"))
  }

  /** EXACT fixed-point log2(c/t) in 2^-fbits units, 1 ≤ c ≤ t — the
    * twin's score kernel: greedy binary normalization of c into
    * [t, 2t) counting doublings e, ONE 31-bit mantissa division, then
    * `fbits` squaring steps each emitting a result bit. Every step is
    * an integer shift/compare/multiply (truncations deterministic),
    * so DuckDB HUGEINT replays it bit-for-bit
    * ([[graft.util.DuckHash.log2fpCtes]]; prototype 0/834 mismatches).
    * No float enters on either side. Shared kernel since r12
    * ([[graft.util.FixedLog.log2fp]] — the HLL kernel's
    * linear-counting estimator rides the same integer log). */
  private[text] def log2fp(c: Long, t: Long, fbits: Int = 20): Long =
    graft.util.FixedLog.log2fp(c, t, fbits)

  /** The integer-EM twin of [[train]] (the multimodal_spectral_q
    * convention, r12): the SAME seed → Viterbi-E → count-M → prune
    * loop, but piece scores come from the exact fixed-point
    * [[log2fp]] instead of q9(ln·) — which removes the ONLY float op
    * in the EM (the score transform; counts and Viterbi compare exact
    * longs already), so the ENTIRE training run — seed vocabulary,
    * every segmentation, every count, every pruning decision, every
    * score — is replayed hash-exactly by [[trainQOracleSql]]. The
    * float-ln [[train]] stays the production path; this gate is its
    * cross-engine witness on identical EM machinery.
    * @return (piece, ql_logp) — scores in 2^-20 log2 units */
  def trainQ(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      iters: Int = 3, seedSize: Int = 4000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fin = trainWith(docs, vocabSize, maxPieceLen, iters, seedSize,
      (c, t) => log2fp(c, t)).toSeq
    spark.createDataset(fin).toDF("piece", "ql_logp")
      .orderBy(col("ql_logp").desc, col("piece"))
  }

  /** Encode docs with a trained model: per-doc token count + md5 of the
    * space-joined piece stream (the same compact digest face as
    * [[Bpe.encode]]). Narrow mapPartitions; model broadcast. */
  def encode(docs: DataFrame, model: Map[String, Long],
      maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val mpl = maxPieceLen
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val sc = bc.value
        // bounded memo — distinct words per partition are vocab-sized
        val memo = collection.mutable.HashMap.empty[String, List[String]]
        rows.map { case (id, text) =>
          val toks = text.split(" ").iterator.filter(_.nonEmpty).flatMap {
            w => memo.getOrElseUpdate(w, viterbi(w, sc, mpl))
          }.toArray
          (id, toks.length.toLong, toks.mkString(" "))
        }
      }.toDF("doc_id", "n_tokens", "tok_stream")
      .select(col("doc_id"), col("n_tokens"),
        md5(col("tok_stream").cast("binary")).as("tokens_md5"))
  }

  /** DuckDB mirror of [[encode]] against an ENGINE-WRITTEN model
    * (the S5 pattern: the oracle reads the parquet files this library
    * wrote, so the cross-engine check covers the Viterbi SEGMENTATION —
    * the train step's float EM stays rows-only).
    *
    * The integer DP is spelled as exhaustive segmentation enumeration:
    * a word of length n has 2^(n-1) binary cut masks (fixture words are
    * ≤ 8 chars → ≤ 128 candidates; words beyond the 12-char/2048-mask
    * enumeration bound surface as a '[OVERLEN]' sentinel that diverges
    * LOUDLY from the Spark fold, the WordPiece-oracle convention), each
    * scored by the exact LONG q9 sum, ranked by the total order the DP
    * induces: score DESC, piece count ASC, then the cut positions read
    * from the END descending (`list_reverse(bounds) DESC`) — the
    * enumeration spelling of the DP's nested latest-final-cut
    * tie-break; randomized cross-validation against the Scala DP lives
    * in tools/ stress runs and UnigramLmSpec. Runs over DISTINCT words
    * (vocab-sized), joined back to doc word slots — the same memoized
    * shape the engine's mapPartitions uses. */
  def encodeOracleSql(modelGlob: String,
      docsRel: String = "documents"): String =
    s"""WITH docs AS (SELECT doc_id, text FROM $docsRel),
       |m AS (
       |  SELECT map_from_entries(list(ROW(piece, q9_logp))) AS mm
       |  FROM read_parquet('$modelGlob')),
       |wrds AS (
       |  SELECT doc_id, CAST(i AS INT) AS wid, ws[CAST(i AS INT)] AS w
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM docs),
       |       unnest(generate_series(1, len(ws))) t(i)
       |  WHERE length(ws[CAST(i AS INT)]) > 0),
       |dw AS (SELECT DISTINCT w FROM wrds WHERE length(w) <= 12),
       |segs AS (
       |  SELECT w, mask,
       |    list_prepend(0, list_append(
       |      [CAST(i AS INT) FOR i IN generate_series(1, length(w)-1)
       |       IF (mask >> (i-1)) & 1 = 1],
       |      length(w))) AS bounds
       |  FROM dw,
       |    unnest(generate_series(0, CAST(2**(length(w)-1) AS BIGINT) - 1)) t(mask)),
       |scored AS (
       |  SELECT w, bounds,
       |    [substr(w, CAST(bounds[k] AS INT) + 1,
       |            CAST(bounds[k+1] - bounds[k] AS INT))
       |     FOR k IN generate_series(1, len(bounds) - 1)] AS pieces,
       |    [mm[p][1] FOR p IN pieces] AS scs
       |  FROM segs CROSS JOIN m),
       |valid AS (
       |  SELECT w, bounds, pieces,
       |    CAST(list_aggregate(scs, 'sum') AS BIGINT) AS score,
       |    len(pieces) AS np
       |  FROM scored
       |  WHERE NOT list_contains([s IS NULL FOR s IN scs], true)),
       |best AS (
       |  SELECT w, array_to_string(pieces, ' ') AS wps, np FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY w
       |      ORDER BY score DESC, np ASC, list_reverse(bounds) DESC) AS rn
       |    FROM valid) WHERE rn = 1)
       |SELECT d.doc_id,
       |  CAST(COALESCE(SUM(CASE WHEN w2.wid IS NULL THEN NULL
       |    ELSE COALESCE(b.np, 1) END), 0) AS BIGINT) AS n_tokens,
       |  md5(COALESCE(string_agg(CASE WHEN w2.wid IS NULL THEN NULL
       |      ELSE COALESCE(b.wps, '[OVERLEN]') END, ' '
       |      ORDER BY w2.wid), '')) AS tokens_md5
       |FROM docs d
       |LEFT JOIN wrds w2 USING (doc_id)
       |LEFT JOIN best b ON w2.w = b.w
       |GROUP BY 1""".stripMargin

  /** One Viterbi-enumeration round as CTEs (the [[encodeOracleSql]]
    * spelling, prefixed so [[trainQOracleSql]] can chain it once per
    * EM iteration): best segmentation per distinct word in `dwCte`
    * (column `word`) under scores `scoreCte` (piece, ql), ranked by
    * the DP's total order — score DESC, piece count ASC, latest final
    * cut (`list_reverse(bounds) DESC`). Emits `${p}best(word, pieces)`.
    * Text starts with a comma (splices after a WITH entry). */
  private def vitCtes(scoreCte: String, dwCte: String, p: String): String =
    s""",
       |${p}m AS (
       |  SELECT map_from_entries(list(ROW(piece, ql))) AS mm FROM $scoreCte),
       |${p}segs AS (
       |  SELECT word, mask,
       |    list_prepend(0, list_append(
       |      [CAST(i AS INT) FOR i IN generate_series(1, length(word)-1)
       |       IF (mask >> (i-1)) & 1 = 1],
       |      length(word))) AS bounds
       |  FROM $dwCte,
       |    unnest(generate_series(0, CAST(2**(length(word)-1) AS BIGINT) - 1)) t(mask)),
       |${p}scored AS (
       |  SELECT word, bounds,
       |    [substr(word, CAST(bounds[k] AS INT) + 1,
       |            CAST(bounds[k+1] - bounds[k] AS INT))
       |     FOR k IN generate_series(1, len(bounds) - 1)] AS pieces,
       |    [mm[pc][1] FOR pc IN pieces] AS scs
       |  FROM ${p}segs CROSS JOIN ${p}m),
       |${p}valid AS (
       |  SELECT word, bounds, pieces,
       |    CAST(list_aggregate(scs, 'sum') AS BIGINT) AS score,
       |    len(pieces) AS np
       |  FROM ${p}scored
       |  WHERE NOT list_contains([s IS NULL FOR s IN scs], true)),
       |${p}best AS (
       |  SELECT word, pieces FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY word
       |      ORDER BY score DESC, np ASC, list_reverse(bounds) DESC) AS rn
       |    FROM ${p}valid) WHERE rn = 1)""".stripMargin

  /** Count-fold + prune + fixed-point-rescore CTEs for one EM round:
    * weighted piece counts from `${p}best` (word multiplicity × corpus
    * freq via unnest), single-char coverage floor ∪ top-`vocabSize`
    * multi-char by (cnt DESC, piece), then [[log2fp]] scores over the
    * kept table via [[graft.util.DuckHash.log2fpCtes]]. Returns
    * (cteText, scoreCteName) with shape (piece, ql). */
  private def emRoundCtes(p: String, vocabSize: Int): (String, String) = {
    val head =
      s""",
         |${p}cnt AS (
         |  SELECT u.piece, CAST(SUM(wc.freq) AS BIGINT) AS cnt
         |  FROM ${p}best b JOIN wc ON wc.word = b.word
         |  CROSS JOIN unnest(b.pieces) u(piece)
         |  GROUP BY 1),
         |${p}kept AS (
         |  SELECT piece, cnt FROM ${p}cnt WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
         |    FROM ${p}cnt WHERE length(piece) > 1) t
         |  WHERE rn <= $vocabSize),
         |${p}tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM ${p}kept)""".stripMargin
    val (logCtes, last) = graft.util.DuckHash.log2fpCtes(
      s"${p}kept", "piece", "cnt", s"${p}tot", s"${p}l")
    (head + logCtes, last)
  }

  /** DuckDB oracle for [[trainQ]] — the FULL EM replayed (r12): word
    * counts, the over-complete seed vocabulary and its (weight DESC,
    * piece) top-k, the fixed-point seed scores, then per iteration the
    * Viterbi segmentation of every distinct word (mask enumeration —
    * ≤ 2^11 candidates at the 12-char bound; longer words diverge
    * LOUDLY by dropping from the count fold, never silently), the
    * weighted count fold, the char-floor ∪ top-`vocabSize` prune, and
    * the [[log2fp]] rescore — every comparison on exact integers both
    * engines compute bit-identically. */
  def trainQOracleSql(vocabSize: Int, maxPieceLen: Int, iters: Int,
      seedSize: Int, docsRel: String = "documents"): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH docs AS (SELECT text FROM $docsRel),
         |wc AS (
         |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM docs) t
         |  WHERE w <> '' GROUP BY 1),
         |dw AS (SELECT word FROM wc WHERE length(word) <= 12),
         |subs AS (
         |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT wc.freq, substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece
         |    FROM wc,
         |      unnest(generate_series(1, length(word))) t1(i),
         |      unnest(generate_series(1, $maxPieceLen)) t2(l)
         |    WHERE i + l - 1 <= length(word)) t
         |  GROUP BY 1),
         |seed AS (
         |  SELECT piece, cnt FROM subs WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
         |    FROM subs WHERE length(piece) > 1) t
         |  WHERE rn <= $seedSize),
         |stot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM seed)""".stripMargin)
    val (seedLog, seedSc) = graft.util.DuckHash.log2fpCtes(
      "seed", "piece", "cnt", "stot", "sl")
    sb.append(seedLog)
    var sc = seedSc
    (1 to iters).foreach { it =>
      val p = s"e$it"
      sb.append(vitCtes(sc, "dw", p))
      val (round, roundSc) = emRoundCtes(p, vocabSize)
      sb.append(round)
      sc = roundSc
    }
    sb.append(s"\nSELECT piece, ql AS ql_logp FROM $sc")
    sb.toString
  }
}
