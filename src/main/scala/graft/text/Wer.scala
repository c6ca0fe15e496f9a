package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word Error Rate — the ASR/translation edit-distance eval: per
  * (candidate, reference) pair the token-level Levenshtein distance
  * over the reference length, `wer_e6 = edits·1e6 div r_len` (can
  * exceed 1e6 — WER is not bounded by 1; identical texts score
  * exactly 0). Completes the eval family's edit-based face next to
  * [[RougeL]]'s LCS.
  *
  * Like LCS, the DP is inherently sequential per pair, so it runs as
  * a typed two-row kernel on the one-row-per-pair frame (one scan,
  * one pair shuffle, then embarrassingly parallel). The ORACLE
  * replays it as a recursive CTE using the prefix-MIN identity
  *   dp_new[j] = j + prefmin_{j'≤j}(a[j'] − j'),
  *   a[j] = min(dp[j]+1, dp[j−1]+subst), a[0] = i+1
  * (edit-distance rows satisfy dp_new[j] ≤ dp_new[j−1]+1, so the
  * sequential insert-chain dependence unrolls into one window per
  * candidate token — the ROUGE-L prefix-max trick with min and a
  * slope term; validated cell-exact against the classic DP on random
  * token lists in WerSpec). Gate contract: both sides truncate to the
  * leading `cap` tokens (bounds the oracle); pairing and NULL/absent
  * -side conventions are [[RougeL]]'s.
  */
object Wer {

  /** Two-row token Levenshtein — O(a·b) time, two int rows. */
  def levLen(a: Array[String], b: Array[String]): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      val ai = a(i - 1)
      var j = 1
      while (j <= b.length) {
        val subst = prev(j - 1) + (if (ai == b(j - 1)) 0 else 1)
        cur(j) = math.min(subst, math.min(prev(j), cur(j - 1)) + 1)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length)
  }

  def wer(docs: DataFrame, cap: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    PairedText.pairs(docs, cap)
      .map { case (p, c, r) =>
        val e = levLen(c.toArray, r.toArray).toLong
        (p, c.length.toLong, r.length.toLong, e, e * 1000000L / r.length)
      }
      .toDF("pair_id", "c_len", "r_len", "edits", "wer_e6")
  }

  /** CORPUS-level WER over the (even, odd) pairs — the number ASR
    * benchmarks actually report: total edits over total reference
    * tokens (micro average — `Σedits·1e6 div Σr_len`; a mean of
    * per-pair WERs overweights short references). Rides the
    * UNCHANGED [[wer]] per-pair frame (same cap-40 gate contract,
    * same pairing), then a 5-column global rollup — nothing new
    * shuffles, and at 100 TB the plan is still one scan + one pair
    * shuffle + embarrassingly parallel DP + one partial-aggregated
    * reduction to a single row. The edits·1e6 intermediate rides
    * DECIMAL(38,0)/HUGEINT (corpus edit counts at scale exceed
    * long·1e6). Output is ONE row. */
  def werCorpus(docs: DataFrame, cap: Int = 40): DataFrame =
    wer(docs, cap)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("c_len")).as("c_tokens"),
        sum(col("r_len")).as("r_tokens"),
        sum(col("edits")).as("edits"))
      .select(col("n_pairs"), col("c_tokens"), col("r_tokens"),
        col("edits"),
        expr("CAST(CAST(edits AS DECIMAL(38,0)) * 1000000 div r_tokens " +
          "AS BIGINT)").as("wer_e6"))

  /** DuckDB mirror of [[werCorpus]] — the [[werSql]] recursion as a
    * derived table under the corpus rollup. */
  def werCorpusSql(cap: Int = 40, from: String = "documents"): String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(c_len) AS BIGINT) AS c_tokens,
       |  CAST(SUM(r_len) AS BIGINT) AS r_tokens,
       |  CAST(SUM(edits) AS BIGINT) AS edits,
       |  CAST((SUM(edits)::HUGEINT * 1000000) // SUM(r_len) AS BIGINT)
       |    AS wer_e6
       |FROM (
       |${werSql(cap, from)}
       |) wc""".stripMargin

  /** The ONE Levenshtein recursive-CTE spelling, shared by [[werSql]],
    * [[cerSql]] and [[MultiRefEval.werSql]] — expects a
    * `<p>_dim(keyCols..., c, r, cl, rl)` CTE prelude (element lists +
    * lengths) and differs only in the key columns and the output
    * rate-column name; a DP change cannot de-synchronize the oracles.
    * One prefix-min window per candidate element. */
  private[text] def levRecSql(dimCtes: String, p: String, outCol: String,
      keyCols: Seq[String] = Seq("pair_id")): String = {
    val ks = keyCols.mkString(", ")
    val recKs = keyCols.map(k => s"${p}_rec.$k").mkString(", ")
    val dKs = keyCols.map(k => s"d.$k").mkString(", ")
    val joinOn = keyCols.map(k => s"d.$k = ${p}_rec.$k").mkString(" AND ")
    s"""WITH RECURSIVE
       |$dimCtes,
       |${p}_rec($ks, i, dp) AS (
       |  SELECT $ks, 0, list_transform(generate_series(0, rl), x -> x)
       |  FROM ${p}_dim
       |  UNION ALL
       |  SELECT $recKs, ${p}_rec.i + 1,
       |    (SELECT list(j + m ORDER BY j) FROM (
       |       SELECT j, MIN(a - j) OVER (ORDER BY j) AS m FROM (
       |         SELECT jj - 1 AS j,
       |           CASE WHEN jj = 1 THEN ${p}_rec.i + 1
       |                ELSE LEAST(${p}_rec.dp[jj] + 1, ${p}_rec.dp[jj - 1] +
       |                  CASE WHEN d.c[${p}_rec.i + 1] = d.r[jj - 1]
       |                       THEN 0 ELSE 1 END)
       |           END AS a
       |         FROM (SELECT generate_subscripts(${p}_rec.dp, 1) AS jj)
       |       )
       |    ))
       |  FROM ${p}_rec JOIN ${p}_dim d ON $joinOn
       |  WHERE ${p}_rec.i < d.cl
       |)
       |SELECT $dKs, CAST(d.cl AS BIGINT) AS c_len,
       |  CAST(d.rl AS BIGINT) AS r_len,
       |  CAST(${p}_rec.dp[d.rl + 1] AS BIGINT) AS edits,
       |  CAST((${p}_rec.dp[d.rl + 1]::HUGEINT * 1000000) // d.rl AS BIGINT)
       |    AS $outCol
       |FROM ${p}_rec JOIN ${p}_dim d ON $joinOn
       |WHERE ${p}_rec.i = d.cl""".stripMargin
  }

  /** DuckDB mirror of [[wer]] (cap > 0 required): the same DP as a
    * recursive CTE, one prefix-min window per candidate token. */
  def werSql(cap: Int = 40, from: String = "documents"): String =
    levRecSql(PairedText.pairCtes(cap, from, "we"), "we", "wer_e6")

  /** Character Error Rate — the CODEPOINT face of the same kernel
    * (the metric ASR teams report next to WER): per pair the
    * Levenshtein distance over the leading `cap` codepoints of the
    * RAW text (spaces included — no tokenization) divided by the
    * reference's codepoint count, `cer_e6 = edits·1e6 div r_len`.
    * Symbols are full codepoints (an astral char is ONE symbol — the
    * [[NgramEval.chrF]] boundary contract; DuckDB substr counts
    * codepoints and the kernel steps codePointAt), so the two engines
    * window identically on the full Unicode domain. Pairing and the
    * NULL-absent rule are [[RougeL]]'s; EMPTY-string sides are
    * additionally dropped (CER is edits/r_len — undefined at r_len 0;
    * both engines filter length ≥ 1 pre-pairing). Identical texts
    * score exactly 0. */
  def cer(docs: DataFrame, cap: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    PairedText.pairsText(docs.filter(length(col("text")) >= 1))
      .map { case (p, cs, rs) =>
        val c = codepointSyms(cs, cap)
        val r = codepointSyms(rs, cap)
        val e = levLen(c, r).toLong
        (p, c.length.toLong, r.length.toLong, e, e * 1000000L / r.length)
      }
      .toDF("pair_id", "c_len", "r_len", "edits", "cer_e6")
  }

  /** CORPUS-level CER — the [[werCorpus]] twin on the codepoint
    * alphabet: total codepoint edits over total reference codepoints
    * (micro average), off the UNCHANGED [[cer]] per-pair frame (same
    * cap-40-codepoint gate contract, same empty-side drop). ONE row;
    * the same DECIMAL(38,0)/HUGEINT rate spelling. */
  def cerCorpus(docs: DataFrame, cap: Int = 40): DataFrame =
    cer(docs, cap)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("c_len")).as("c_cps"),
        sum(col("r_len")).as("r_cps"),
        sum(col("edits")).as("edits"))
      .select(col("n_pairs"), col("c_cps"), col("r_cps"),
        col("edits"),
        expr("CAST(CAST(edits AS DECIMAL(38,0)) * 1000000 div r_cps " +
          "AS BIGINT)").as("cer_e6"))

  /** DuckDB mirror of [[cerCorpus]]. */
  def cerCorpusSql(cap: Int = 40, from: String = "documents"): String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(c_len) AS BIGINT) AS c_cps,
       |  CAST(SUM(r_len) AS BIGINT) AS r_cps,
       |  CAST(SUM(edits) AS BIGINT) AS edits,
       |  CAST((SUM(edits)::HUGEINT * 1000000) // SUM(r_len) AS BIGINT)
       |    AS cer_e6
       |FROM (
       |${cerSql(cap, from)}
       |) cc""".stripMargin

  /** Leading-`cap` codepoints of `s` as single-codepoint strings
    * (surrogate pairs collapse to one symbol). */
  private def codepointSyms(s: String, cap: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length && out.length < cap) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** DuckDB mirror of [[cer]] (cap > 0 required): the [[levRecSql]]
    * recursion over per-codepoint substr lists of substr(text, 1, cap)
    * — DuckDB substr/length count codepoints, matching the kernel. */
  def cerSql(cap: Int = 40, from: String = "documents"): String = {
    val dim =
      s"""ce_src AS (
         |  SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
         |         ((doc_id % 2) + 2) % 2 AS side,
         |         substr(text, 1, $cap) AS s
         |  FROM $from WHERE text IS NOT NULL AND length(text) >= 1),
         |ce_pair AS (
         |  SELECT pair_id,
         |         MAX(CASE WHEN side = 0 THEN s END) AS cs,
         |         MAX(CASE WHEN side = 1 THEN s END) AS rs
         |  FROM ce_src GROUP BY 1
         |  HAVING COUNT(DISTINCT side) = 2),
         |ce_dim AS (SELECT pair_id,
         |  list_transform(generate_series(1, length(cs)), i -> substr(cs, i, 1)) AS c,
         |  list_transform(generate_series(1, length(rs)), i -> substr(rs, i, 1)) AS r,
         |  length(cs) AS cl, length(rs) AS rl
         |  FROM ce_pair)""".stripMargin
    levRecSql(dim, "ce", "cer_e6")
  }

  /** Corpus diversity — distinct-n (Li et al. 2016): per gram order
    * 1..`maxN`, the number of DISTINCT word n-grams over the corpus
    * divided by the total emitted, `distinct_ratio_e6` (low = heavy
    * repetition, the standard degeneracy signal on model output).
    * One scan, the rolling-hash gram currency, two map-side-combined
    * shuffles — at 100 TB this is the [[NgramEval]] plan minus the
    * pairing. */
  def distinctN(docs: DataFrame, maxN: Int = 4): DataFrame = {
    graft.functions.GramHashes.register(docs.sparkSession)
    docs
      .withColumn("ws", split(col("text"), " "))
      .select(explode(expr(s"word_gram_hashes(ws, 1, $maxN)")).as("e"))
      .select(expr("CAST(e & 7 AS INT)").as("n"), col("e").as("g"))
      .groupBy(col("n"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("distinct_grams"),
        sum(col("cnt")).as("total_grams"))
      .select(col("n"), col("distinct_grams"), col("total_grams"),
        expr("CAST(distinct_grams * 1000000 div total_grams AS BIGINT)")
          .as("distinct_ratio_e6"))
  }

  /** DuckDB mirror of [[distinctN]]. */
  def distinctNSql(maxN: Int = 4, from: String = "documents"): String =
    s"""WITH dn_ws AS (
       |  SELECT string_split(text, ' ') AS ws FROM $from
       |  WHERE text IS NOT NULL),
       |dn_g AS (
       |  SELECT tn.n AS n, md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM dn_ws, unnest(generate_series(1, $maxN)) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |dn_ng AS (SELECT n, g, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM dn_g GROUP BY 1, 2)
       |SELECT CAST(n AS INT) AS n,
       |  CAST(COUNT(*) AS BIGINT) AS distinct_grams,
       |  CAST(SUM(cnt) AS BIGINT) AS total_grams,
       |  CAST((CAST(COUNT(*) AS HUGEINT) * 1000000) // SUM(cnt) AS BIGINT)
       |    AS distinct_ratio_e6
       |FROM dn_ng GROUP BY 1""".stripMargin
}
