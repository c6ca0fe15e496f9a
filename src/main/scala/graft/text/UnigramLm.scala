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

  /** Train: seed → `iters` EM rounds (Viterbi hard-E-step over the
    * weighted word frame, count-fold M-step, prune to `vocabSize` by
    * (count, piece) keeping all single chars).
    *
    * Driver-materialization contract: the ONLY collects are the model
    * artifact itself — ≤ max(seedSize, vocabSize) + |alphabet| rows per
    * EM round (the table being broadcast back out, exactly like Bpe's
    * merge list). Both knobs are hard-capped at 1,000,000 pieces so the
    * bound is explicit rather than caller-trusted; a 10⁶-piece model is
    * ~50 MB broadcast, far beyond any published subword vocab.
    *
    * @return (piece, cnt, logp) — the shipped tokenizer model */
  def train(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      iters: Int = 3, seedSize: Int = 4000): DataFrame = {
    require(seedSize > 0 && seedSize <= 1000000,
      s"seedSize=$seedSize outside (0, 1e6]: the seed vocab is collected " +
        "to the driver as the model artifact and must stay bounded")
    require(vocabSize > 0 && vocabSize <= 1000000,
      s"vocabSize=$vocabSize outside (0, 1e6]: the trained vocab is " +
        "collected to the driver as the model artifact and must stay bounded")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs).as[(String, Long)].cache()

    // init scores from seed weights: logp = ln(w / total)
    val seed = seedVocab(words.toDF(), maxPieceLen, seedSize)
      .as[(String, Long)].collect()
    var total = seed.map(_._2).sum.toDouble
    var score: Map[String, Long] =
      seed.map { case (p, w) => p -> q9(math.log(w / total)) }.toMap

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
      total = kept.map(_._2).sum.toDouble
      score = kept.map { case (p, c) => p -> q9(math.log(c / total)) }.toMap
      bc.unpersist()
      it += 1
    }
    words.unpersist()
    val fin = score.toSeq
    spark.createDataset(fin).toDF("piece", "q9_logp")
      .withColumn("logp", col("q9_logp").cast("double") / 1e9)
      .orderBy(col("q9_logp").desc, col("piece"))
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
}
