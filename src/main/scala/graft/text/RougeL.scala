package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The shared (even, odd) capped token-pair frame for the per-pair DP
  * metrics ([[RougeL]], [[Wer]]) — ONE spelling of the pairing, the
  * leading-`cap` truncation, the NULL-text-is-absent-side rule, and
  * the both-sides drop, in both engines (a pairing or cap change must
  * not be able to de-synchronize the two gates or their oracles). */
private[text] object PairedText {

  /** One row per complete pair: (pair_id, cand tokens, ref tokens).
    * cap ≤ 0 disables truncation. */
  def pairs(docs: DataFrame, cap: Int): Dataset[(Long, Seq[String], Seq[String])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ws =
      if (cap > 0) expr(s"slice(split(text, ' '), 1, $cap)")
      else split(col("text"), " ")
    docs
      .select(
        (col("doc_id") - pmod(col("doc_id"), lit(2))).as("pair_id"),
        pmod(col("doc_id"), lit(2)).as("side"),
        ws.as("ws"))
      .groupBy(col("pair_id"))
      .agg(
        first(when(col("side") === 0, col("ws")), ignoreNulls = true).as("c"),
        first(when(col("side") === 1, col("ws")), ignoreNulls = true).as("r"))
      .filter(col("c").isNotNull && col("r").isNotNull)
      .as[(Long, Seq[String], Seq[String])]
  }

  /** Raw-TEXT face of the same pairing — (pair_id, cand text, ref
    * text), same NULL-absent / both-sides rules, no tokenization (the
    * CER kernel caps and splits by CODEPOINT itself, so truncation
    * stays a kernel concern like [[Wer.cer]]'s oracle twin). */
  def pairsText(docs: DataFrame): Dataset[(Long, String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        (col("doc_id") - pmod(col("doc_id"), lit(2))).as("pair_id"),
        pmod(col("doc_id"), lit(2)).as("side"),
        col("text"))
      .groupBy(col("pair_id"))
      .agg(
        first(when(col("side") === 0, col("text")), ignoreNulls = true).as("c"),
        first(when(col("side") === 1, col("text")), ignoreNulls = true).as("r"))
      .filter(col("c").isNotNull && col("r").isNotNull)
      .as[(Long, String, String)]
  }

  /** Sided face for the keyed gram cores — (pair_id, side, text), no
    * tokenization, no drop (each metric core applies its own filters).
    * The positional twin of [[MultiRefEval.sides]]. */
  def sided(docs: DataFrame): DataFrame =
    docs.select(
      (col("doc_id") - pmod(col("doc_id"), lit(2))).as("pair_id"),
      pmod(col("doc_id"), lit(2)).as("side"),
      col("text"))

  /** Pivoted raw-text face for the gram-count KERNELS (r15
    * optimization) — one row per pair_id with both texts side by side
    * (NULL = absent side; no drop, each kernel applies its own
    * presence rules). ONE text-sized shuffle replaces the 6-9×-wider
    * gram-stream aggregation the exploded spelling paid. */
  def paired(docs: DataFrame): DataFrame =
    sided(docs)
      .groupBy(col("pair_id"))
      .agg(
        first(when(col("side") === 0, col("text")), ignoreNulls = true)
          .as("c_text"),
        first(when(col("side") === 1, col("text")), ignoreNulls = true)
          .as("r_text"))

  /** The paired-bootstrap quad layout, pivoted: one row per quad_id
    * with slots 0 (system A), 1 (shared reference), 2 (system B) side
    * by side; slot 3 unused. */
  def quadTexts(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(4)) < 3)
      .select(
        (col("doc_id") - pmod(col("doc_id"), lit(4))).as("quad_id"),
        pmod(col("doc_id"), lit(4)).as("slot"),
        col("text"))
      .groupBy(col("quad_id"))
      .agg(
        first(when(col("slot") === 0, col("text")), ignoreNulls = true)
          .as("a_text"),
        first(when(col("slot") === 1, col("text")), ignoreNulls = true)
          .as("r_text"),
        first(when(col("slot") === 2, col("text")), ignoreNulls = true)
          .as("b_text"))

  /** DuckDB twin of [[sided]] — a parenthesized relation exposing
    * (pair_id, side, text). */
  def sidedSql(from: String): String =
    s"""(SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
       |  ((doc_id % 2) + 2) % 2 AS side, text FROM $from)""".stripMargin

  /** The DuckDB twin: `<p>_ws` / `<p>_pair` / `<p>_dim` CTE prelude
    * (no leading WITH, no trailing comma) exposing per pair the token
    * lists `c`/`r` and lengths `cl`/`rl`. */
  def pairCtes(cap: Int, from: String, p: String): String =
    s"""${p}_ws AS (
       |  SELECT doc_id - (((doc_id % 2) + 2) % 2) AS pair_id,
       |         ((doc_id % 2) + 2) % 2 AS side,
       |         string_split(text, ' ')[1:$cap] AS ws
       |  FROM $from WHERE text IS NOT NULL),
       |${p}_pair AS (
       |  SELECT pair_id,
       |         MAX(CASE WHEN side = 0 THEN ws END) AS c,
       |         MAX(CASE WHEN side = 1 THEN ws END) AS r
       |  FROM ${p}_ws GROUP BY 1
       |  HAVING COUNT(DISTINCT side) = 2),
       |${p}_dim AS (SELECT pair_id, c, r, len(c) AS cl, len(r) AS rl
       |  FROM ${p}_pair)""".stripMargin
}

/** ROUGE-L (Lin 2004) — the LCS-based generation-eval metric, closing
  * the standard set next to BLEU-n/ROUGE-n ([[NgramEval.clippedOverlap]]),
  * BLEU-4 ([[NgramEval.bleu4]]) and chrF ([[NgramEval.chrF]]).
  *
  * Per (candidate, reference) pair over word tokens, with L = |LCS|:
  *   P = L/c_len, R = L/r_len,
  *   F1 = 2PR/(P+R) = 2L/(c_len + r_len)
  * — the same P/R cancellation as chrF, so the WHOLE metric is one
  * rational of longs (`rouge_l_f_e6 = 2·L·1e6 div (c_len+r_len)`,
  * floor division both engines; identical texts score exactly 1e6).
  * β = 1 (the rouge-score reference default); Lin's recall-weighted
  * β→∞ variant is just R = lcs/r_len off the same columns.
  *
  * LCS itself is inherently sequential per pair (classic O(c·r) DP),
  * so it runs as a typed per-pair kernel — the (c) tier of the custom
  * -operator preference order, like the resample's per-lap groups:
  * texts are bounded per row, the DP state is two int rows, and the
  * frame entering the kernel is one row per pair (NOT per token), so
  * at 100 TB this is one scan, one (pair) shuffle, then embarrassingly
  * parallel per-pair work with no further exchange.
  *
  * GATE CONTRACT: both sides truncate to the leading `cap` tokens
  * (default 40) — that bounds the ORACLE, which replays the same DP in
  * DuckDB as a recursive CTE carrying the dp row as a list (one
  * prefix-max window per candidate token; cost grows with cap², 22 s
  * at sf0.1/cap 40). The Spark kernel itself is length-unbounded
  * (RougeLSpec runs it uncapped); pass cap ≤ 0 to disable truncation.
  * Pairing: candidate = even doc_id, reference = doc_id+1 (Euclidean
  * parity, the eval-family convention); one-sided pairs are dropped —
  * unlike bleu4/chrF there is NO minimum-length drop (LCS is total on
  * any non-empty token lists, and split("") = [""] is 1 token).
  */
object RougeL {

  /** Two-row LCS DP over token arrays — O(a·b) time, O(min-side) space
    * would need the shorter side inner; rows are over `b`, fine for
    * gate-capped and document-sized inputs alike. */
  def lcsLen(a: Array[String], b: Array[String]): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      val ai = a(i - 1)
      var j = 1
      while (j <= b.length) {
        cur(j) =
          if (ai == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length)
  }

  def rougeL(docs: DataFrame, cap: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    PairedText.pairs(docs, cap)
      .map { case (p, c, r) =>
        val l = lcsLen(c.toArray, r.toArray).toLong
        (p, c.length.toLong, r.length.toLong, l,
          2L * l * 1000000L / (c.length + r.length))
      }
      .toDF("pair_id", "c_len", "r_len", "lcs", "rouge_l_f_e6")
  }

  /** ROUGE-1 / ROUGE-2 (Lin 2004) — the n-gram recall family the
    * rouge-score reference reports NEXT TO ROUGE-L: per pair and gram
    * order, overlap = Σ_g min(cnt_c(g), cnt_r(g)) (the clipped count),
    * P = overlap/c_grams, R = overlap/r_grams, and the same P/R
    * cancellation as [[rougeL]] makes F1 one rational of longs:
    * `rougeN_f_e6 = 2·overlap·1e6 div (c_grams + r_grams)`. Output is
    * ONE row per pair with both orders side by side (the rouge-score
    * reporting shape; `pairs_scored` in the drop ledger = row count):
    * order-2 columns are NULL when either side has no bigram (a
    * 1-word side — P or R undefined), spelled identically in the
    * oracle. Pairing/NULL rules are [[rougeL]]'s; like it there is no
    * minimum-length drop. No cap — the clipped-count kernel is exact
    * at any length (only the DP metrics truncate). Scale shape: the
    * [[NgramEval.perPairWordCounts]] plan at orders 1..2 (one scan,
    * two map-side-combined shuffles, gram text never shuffles) plus a
    * per-pair pivot — no joins, no DP, no collect. Intermediates ride
    * DECIMAL(38,0)/HUGEINT so corpus-scale counts cannot overflow. */
  def rougeN(docs: DataFrame): DataFrame =
    rougeNPerKey(PairedText.paired(docs), Seq("pair_id"))

  /** The keyed ROUGE-N core — `paired` carries `keyCols` + (c_text,
    * r_text); the positional gate keys by pair_id, [[MultiRefEval
    * .rougeN]] by (cand_id, ref_id) so each reference scores
    * independently before the per-candidate max-F reduction (the
    * rouge-score multi-ref convention). Since r15 the (key, n, gram)
    * aggregation runs as the local [[PairGramKernel]] count map over
    * the pivoted pair (same packed hashes, identical counts) — one
    * text-sized shuffle instead of the exploded gram stream. */
  private[text] def rougeNPerKey(paired: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val pn = NgramEval.pairKernelCounts(paired, keyCols,
      PairGramKernel.wordGrams(_, 1, 2, 0))
    def e6(num: String, den: String) =
      expr(s"CAST(CAST($num AS DECIMAL(38,0)) * 1000000 div ($den) AS BIGINT)")
    def f2(num: String, den: String) =
      expr(s"CAST(CAST($num AS DECIMAL(38,0)) * 2000000 div ($den) AS BIGINT)")
    val has2 = col("c2") >= 1 && col("r2") >= 1
    pn.groupBy(keys: _*)
      .agg(
        max(when(col("n") === 1, col("c_total"))).as("c_words"),
        max(when(col("n") === 1, col("r_total"))).as("r_words"),
        max(when(col("n") === 1, col("clipped"))).as("r1_clipped"),
        max(when(col("n") === 2, col("c_total"))).as("c2"),
        max(when(col("n") === 2, col("r_total"))).as("r2"),
        max(when(col("n") === 2, col("clipped"))).as("cl2"))
      .filter(col("c_words") >= 1 && col("r_words") >= 1)
      .select(keys ++ Seq(col("c_words"), col("r_words"),
        col("r1_clipped"),
        e6("r1_clipped", "c_words").as("rouge1_p_e6"),
        e6("r1_clipped", "r_words").as("rouge1_r_e6"),
        f2("r1_clipped", "c_words + r_words").as("rouge1_f_e6"),
        when(has2, col("cl2")).as("r2_clipped"),
        when(has2, e6("cl2", "c2")).as("rouge2_p_e6"),
        when(has2, e6("cl2", "r2")).as("rouge2_r_e6"),
        when(has2, f2("cl2", "c2 + r2")).as("rouge2_f_e6")): _*)
  }

  /** DuckDB mirror of [[rougeN]]. */
  def rougeNSql(from: String = "documents"): String =
    rougeNPerKeySql(Seq("pair_id"), PairedText.sidedSql(from))

  /** DuckDB mirror of [[rougeNPerKey]] — `sidedFrom` must be a
    * parenthesized relation exposing `keyCols` + (side, text). */
  private[text] def rougeNPerKeySql(keyCols: Seq[String],
      sidedFrom: String): String = {
    val ks = keyCols.mkString(", ")
    def e6(num: String, den: String) =
      s"CAST(($num::HUGEINT * 1000000) // ($den) AS BIGINT)"
    def f2(num: String, den: String) =
      s"CAST(($num::HUGEINT * 2000000) // ($den) AS BIGINT)"
    val has2 = "c2 >= 1 AND r2 >= 1"
    s"""WITH rn_ws AS (
       |  SELECT $ks, side, string_split(text, ' ') AS ws
       |  FROM $sidedFrom sd WHERE text IS NOT NULL),
       |rn_g AS (
       |  SELECT $ks, side, tn.n AS n,
       |         md5(array_to_string(ws[i:i+tn.n-1], ' ')) AS g
       |  FROM rn_ws, unnest([1, 2]) tn(n),
       |       unnest(generate_series(1, len(ws) - tn.n + 1)) t(i)
       |  WHERE len(ws) >= tn.n),
       |rn_pg AS (SELECT $ks, n, g,
       |  CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt,
       |  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt
       |  FROM rn_g GROUP BY $ks, n, g),
       |rn_pn AS (SELECT $ks, n,
       |  CAST(SUM(LEAST(c_cnt, r_cnt)) AS BIGINT) AS clipped,
       |  CAST(SUM(c_cnt) AS BIGINT) AS c_total,
       |  CAST(SUM(r_cnt) AS BIGINT) AS r_total
       |  FROM rn_pg GROUP BY $ks, n),
       |rn_p AS (SELECT $ks,
       |  MAX(CASE WHEN n = 1 THEN c_total END) AS c_words,
       |  MAX(CASE WHEN n = 1 THEN r_total END) AS r_words,
       |  MAX(CASE WHEN n = 1 THEN clipped END) AS r1c,
       |  MAX(CASE WHEN n = 2 THEN c_total END) AS c2,
       |  MAX(CASE WHEN n = 2 THEN r_total END) AS r2,
       |  MAX(CASE WHEN n = 2 THEN clipped END) AS cl2
       |  FROM rn_pn GROUP BY $ks
       |  HAVING MAX(CASE WHEN n = 1 THEN c_total END) >= 1
       |     AND MAX(CASE WHEN n = 1 THEN r_total END) >= 1)
       |SELECT $ks, c_words, r_words, r1c AS r1_clipped,
       |  ${e6("r1c", "c_words")} AS rouge1_p_e6,
       |  ${e6("r1c", "r_words")} AS rouge1_r_e6,
       |  ${f2("r1c", "c_words + r_words")} AS rouge1_f_e6,
       |  CASE WHEN $has2 THEN cl2 END AS r2_clipped,
       |  CASE WHEN $has2 THEN ${e6("cl2", "c2")} END AS rouge2_p_e6,
       |  CASE WHEN $has2 THEN ${e6("cl2", "r2")} END AS rouge2_r_e6,
       |  CASE WHEN $has2 THEN ${f2("cl2", "c2 + r2")} END AS rouge2_f_e6
       |FROM rn_p""".stripMargin
  }

  /** DuckDB mirror of [[rougeL]] (cap > 0 required — the oracle's cost
    * is bounded by it): the SAME two-row DP, iterated as a recursive
    * CTE over candidate positions with the dp row carried as a list;
    * the classic dp_new(j) = prefmax_j(max(dp(j), dp(j−1)+match)) form
    * makes each step ONE prefix-max window. */
  def rougeLSql(cap: Int = 40, from: String = "documents"): String =
    lcsRecSql(PairedText.pairCtes(cap, from, "rl"), "rl")

  /** The ONE LCS recursive-CTE spelling, shared by [[rougeLSql]] and
    * [[MultiRefEval.rougeLSql]] — expects a `<p>_dim(keyCols..., c, r,
    * cl, rl)` CTE prelude; one prefix-max window per candidate token
    * (the [[Wer.levRecSql]] pattern with max and no slope term). */
  private[text] def lcsRecSql(dimCtes: String, p: String,
      keyCols: Seq[String] = Seq("pair_id")): String = {
    val ks = keyCols.mkString(", ")
    val recKs = keyCols.map(k => s"${p}_rec.$k").mkString(", ")
    val dKs = keyCols.map(k => s"d.$k").mkString(", ")
    val joinOn = keyCols.map(k => s"d.$k = ${p}_rec.$k").mkString(" AND ")
    s"""WITH RECURSIVE
       |$dimCtes,
       |${p}_rec($ks, i, dp) AS (
       |  SELECT $ks, 0, list_transform(generate_series(0, rl), x -> 0)
       |  FROM ${p}_dim
       |  UNION ALL
       |  SELECT $recKs, ${p}_rec.i + 1,
       |    (SELECT list(m ORDER BY j) FROM (
       |       SELECT j, MAX(q) OVER (ORDER BY j) AS m FROM (
       |         SELECT jj - 1 AS j,
       |           CASE WHEN jj = 1 THEN 0
       |                ELSE GREATEST(${p}_rec.dp[jj], ${p}_rec.dp[jj - 1] +
       |                  CASE WHEN d.c[${p}_rec.i + 1] = d.r[jj - 1]
       |                       THEN 1 ELSE 0 END)
       |           END AS q
       |         FROM (SELECT generate_subscripts(${p}_rec.dp, 1) AS jj)
       |       )
       |    ))
       |  FROM ${p}_rec JOIN ${p}_dim d ON $joinOn
       |  WHERE ${p}_rec.i < d.cl
       |)
       |SELECT $dKs, CAST(d.cl AS BIGINT) AS c_len,
       |  CAST(d.rl AS BIGINT) AS r_len,
       |  CAST(${p}_rec.dp[d.rl + 1] AS BIGINT) AS lcs,
       |  CAST((2::HUGEINT * ${p}_rec.dp[d.rl + 1] * 1000000)
       |       // (d.cl + d.rl) AS BIGINT) AS rouge_l_f_e6
       |FROM ${p}_rec JOIN ${p}_dim d ON $joinOn
       |WHERE ${p}_rec.i = d.cl""".stripMargin
  }
}
