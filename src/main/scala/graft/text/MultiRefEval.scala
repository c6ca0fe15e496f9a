package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multi-reference faces for the rest of the generation-eval family —
  * the explicit keyed pair-table shape real holdout evals take
  * (`cands(cand_id, text)` × `refs(cand_id, ref_id, text)`, SEVERAL
  * references per candidate) that [[NgramEval.bleu4MultiRef]] already
  * has, extended to ROUGE-L, WER, chrF, chrF++ and token-F1 with each
  * metric's STANDARD multi-reference reduction:
  *
  *  - ROUGE-L / chrF / chrF++ / token-F1: score each reference
  *    independently, keep the MAX score (the rouge-score and sacrebleu
  *    segment conventions; SQuAD takes max F1 AND max exact-match over
  *    gold answers);
  *  - WER: MIN error rate over references (the ASR multi-reference
  *    convention — the best-matching transcript bounds the error).
  *
  * Unlike BLEU there is NO cross-reference gram pooling in these
  * metrics (BLEU's max-per-gram clip is a property of its modified
  * precision only), so each (candidate, reference) pair runs the
  * UNMODIFIED single-pair kernel keyed by (cand_id, ref_id) — the
  * positional gates are the same cores keyed by pair_id, and a
  * single-reference input reproduces them score-for-score
  * (MultiRefEvalSpec pins it per metric).
  *
  * Scale shape: ONE hash join of candidates to references on cand_id
  * (a few references per candidate), then the per-pair kernels exactly
  * as in the positional gates — the gram metrics re-window the
  * candidate text once per reference (k× kernel work at O(1)/gram, the
  * clipped counts are pair-specific so per-pair counting is inherent;
  * a gram-keyed join of pre-aggregated candidate counts would trade
  * that linear work for an extra gram-wide shuffle), the DP metrics
  * shuffle one row per (candidate, reference) and run embarrassingly
  * parallel. The per-candidate max/min reduction is one more combined
  * hash aggregation on a few-rows-per-candidate frame.
  *
  * `n_refs` counts the references the metric actually SCORED (pairs
  * satisfying the metric's drop contract — NULL-text or too-short
  * references are absent sides, the eval-family convention), so a
  * downstream aggregate sees the coverage behind each max/min.
  */
object MultiRefEval {

  /** Keyed pair frame for the gram-count KERNELS — (cand_id, ref_id,
    * c_text, r_text) straight off ONE cand_id hash join (the join IS
    * the pivot; no sided explode, no re-grouping). NULL texts pass
    * through; each metric kernel applies its own presence rules. */
  private[text] def pairedKeyed(cands: DataFrame, refs: DataFrame): DataFrame =
    cands.select(col("cand_id"), col("text").as("c_text"))
      .join(refs.select(col("cand_id"),
        col("ref_id").cast("long").as("ref_id"),
        col("text").as("r_text")), Seq("cand_id"))
      .select(col("cand_id"), col("ref_id"), col("c_text"), col("r_text"))

  /** DuckDB sided frame for the keyed gram-core SQL mirrors — the
    * oracle spelling is unchanged (the kernel only moved where the
    * SPARK side counts; the SQL twins still aggregate the exploded
    * (key, n, gram) stream). */
  private def sidesSql(candsFrom: String, refsFrom: String): String =
    s"""(SELECT rr.cand_id, rr.ref_id, 0 AS side, cc.text
       |  FROM $candsFrom cc JOIN $refsFrom rr ON rr.cand_id = cc.cand_id
       |  UNION ALL
       |  SELECT cand_id, ref_id, 1 AS side, text FROM $refsFrom r2)""".stripMargin

  /** Keyed token-pair frame for the DP kernels — one row per complete
    * (candidate, reference) pair, both sides capped to the leading
    * `cap` tokens (≤ 0 disables), NULL-text rows absent. The keyed
    * twin of [[PairedText.pairs]]. */
  private[text] def pairs(cands: DataFrame, refs: DataFrame,
      cap: Int): Dataset[(Long, Long, Seq[String], Seq[String])] = {
    val spark = cands.sparkSession
    import spark.implicits._
    def ws =
      if (cap > 0) expr(s"slice(split(text, ' '), 1, $cap)")
      else split(col("text"), " ")
    cands.filter(col("text").isNotNull)
      .select(col("cand_id"), ws.as("c"))
      .join(refs.filter(col("text").isNotNull)
        .select(col("cand_id"), col("ref_id").cast("long").as("ref_id"),
          ws.as("r")), Seq("cand_id"))
      .select(col("cand_id"), col("ref_id"), col("c"), col("r"))
      .as[(Long, Long, Seq[String], Seq[String])]
  }

  /** DuckDB twin of [[pairs]]: a `<p>_dim(cand_id, ref_id, c, r, cl,
    * rl)` CTE prelude for the keyed DP recursions. */
  private def keyedPairCtes(cap: Int, candsFrom: String, refsFrom: String,
      p: String): String =
    s"""${p}_dim AS (
       |  SELECT c.cand_id AS cand_id, r.ref_id AS ref_id,
       |    string_split(c.text, ' ')[1:$cap] AS c,
       |    string_split(r.text, ' ')[1:$cap] AS r,
       |    len(string_split(c.text, ' ')[1:$cap]) AS cl,
       |    len(string_split(r.text, ' ')[1:$cap]) AS rl
       |  FROM $candsFrom c JOIN $refsFrom r ON r.cand_id = c.cand_id
       |  WHERE c.text IS NOT NULL AND r.text IS NOT NULL)""".stripMargin

  /** Multi-reference ROUGE-L: max LCS-F1 over the candidate's
    * references (leading-`cap`-token window per side, the positional
    * gate's oracle-bounding contract). */
  def rougeL(cands: DataFrame, refs: DataFrame, cap: Int = 40): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    pairs(cands, refs, cap)
      .map { case (cid, _, c, r) =>
        val l = RougeL.lcsLen(c.toArray, r.toArray).toLong
        (cid, 2L * l * 1000000L / (c.length + r.length))
      }
      .toDF("cand_id", "f")
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_refs"), max(col("f")).as("rouge_l_f_e6"))
  }

  /** DuckDB mirror of [[rougeL]] — the keyed [[RougeL.lcsRecSql]]
    * recursion, then the max-F reduction. */
  def rougeLSql(cap: Int = 40, candsFrom: String, refsFrom: String): String =
    s"""SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  MAX(rouge_l_f_e6) AS rouge_l_f_e6
       |FROM (
       |${RougeL.lcsRecSql(keyedPairCtes(cap, candsFrom, refsFrom, "mr"),
        "mr", Seq("cand_id", "ref_id"))}
       |) q GROUP BY 1""".stripMargin

  /** Multi-reference WER: MIN token-Levenshtein error rate over the
    * candidate's references (leading-`cap`-token window per side). */
  def wer(cands: DataFrame, refs: DataFrame, cap: Int = 40): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    pairs(cands, refs, cap)
      .map { case (cid, _, c, r) =>
        val e = Wer.levLen(c.toArray, r.toArray).toLong
        (cid, e * 1000000L / r.length)
      }
      .toDF("cand_id", "w")
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_refs"), min(col("w")).as("wer_e6"))
  }

  /** DuckDB mirror of [[wer]] — the keyed [[Wer.levRecSql]] recursion,
    * then the min-rate reduction. */
  def werSql(cap: Int = 40, candsFrom: String, refsFrom: String): String =
    s"""SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  MIN(wer_e6) AS wer_e6
       |FROM (
       |${Wer.levRecSql(keyedPairCtes(cap, candsFrom, refsFrom, "mw"),
        "mw", "wer_e6", Seq("cand_id", "ref_id"))}
       |) q GROUP BY 1""".stripMargin

  /** Multi-reference chrF: max F-β over the references that satisfy
    * the chrF contract (both sides ≥ maxN chars — `n_refs` counts
    * exactly those). */
  def chrF(cands: DataFrame, refs: DataFrame, beta2: Int = 4,
      maxN: Int = 6): DataFrame =
    NgramEval.chrFPerKey(pairedKeyed(cands, refs), Seq("cand_id", "ref_id"),
      beta2, maxN)
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_refs"), max(col("chrf_e6")).as("chrf_e6"))

  /** DuckDB mirror of [[chrF]]. */
  def chrFSql(beta2: Int = 4, maxN: Int = 6,
      candsFrom: String, refsFrom: String): String =
    s"""SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  MAX(chrf_e6) AS chrf_e6
       |FROM (
       |${NgramEval.chrFPerKeySql(Seq("cand_id", "ref_id"),
        sidesSql(candsFrom, refsFrom), beta2, maxN)}
       |) q GROUP BY 1""".stripMargin

  /** Multi-reference chrF++: max 8-component F-β over the references
    * satisfying the chrF++ contract (≥ maxN chars AND ≥ 2 words per
    * side). */
  def chrFpp(cands: DataFrame, refs: DataFrame, beta2: Int = 4,
      maxN: Int = 6, wordN: Int = 2): DataFrame =
    NgramEval.chrFppPerKey(pairedKeyed(cands, refs), Seq("cand_id", "ref_id"),
      beta2, maxN, wordN)
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_refs"), max(col("chrfpp_e6")).as("chrfpp_e6"))

  /** DuckDB mirror of [[chrFpp]]. */
  def chrFppSql(beta2: Int = 4, maxN: Int = 6, wordN: Int = 2,
      candsFrom: String, refsFrom: String): String =
    s"""SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  MAX(chrfpp_e6) AS chrfpp_e6
       |FROM (
       |${NgramEval.chrFppPerKeySql(Seq("cand_id", "ref_id"),
        sidesSql(candsFrom, refsFrom), beta2, maxN, wordN)}
       |) q GROUP BY 1""".stripMargin

  /** Multi-reference ROUGE-1/2: max F1 PER ORDER over the references
    * (the rouge-score convention — like token-F1's two maxima, the
    * best-matching reference for unigrams and for bigrams may
    * differ). `n_refs` counts references scored at order 1 (both
    * sides ≥ 1 word); rouge2 is NULL when NO scored reference has
    * bigrams on both sides. */
  def rougeN(cands: DataFrame, refs: DataFrame): DataFrame =
    RougeL.rougeNPerKey(pairedKeyed(cands, refs), Seq("cand_id", "ref_id"))
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_refs"),
        max(col("rouge1_f_e6")).as("rouge1_f_e6"),
        max(col("rouge2_f_e6")).as("rouge2_f_e6"))

  /** DuckDB mirror of [[rougeN]]. */
  def rougeNSql(candsFrom: String, refsFrom: String): String =
    s"""SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  MAX(rouge1_f_e6) AS rouge1_f_e6,
       |  MAX(rouge2_f_e6) AS rouge2_f_e6
       |FROM (
       |${RougeL.rougeNPerKeySql(Seq("cand_id", "ref_id"),
        sidesSql(candsFrom, refsFrom))}
       |) q GROUP BY 1""".stripMargin

  /** Multi-reference SQuAD token-F1: max token-bag F1 AND max exact
    * match over the references (the SQuAD gold-answer convention —
    * the two maxima may come from different references). */
  def tokenF1(cands: DataFrame, refs: DataFrame): DataFrame =
    NgramEval.tokenF1PerKey(pairedKeyed(cands, refs), Seq("cand_id", "ref_id"))
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_refs"),
        max(col("token_f1_e6")).as("token_f1_e6"),
        max(col("exact_match")).as("exact_match"))

  /** DuckDB mirror of [[tokenF1]]. */
  def tokenF1Sql(candsFrom: String, refsFrom: String): String =
    s"""SELECT cand_id, CAST(COUNT(*) AS BIGINT) AS n_refs,
       |  MAX(token_f1_e6) AS token_f1_e6,
       |  MAX(exact_match) AS exact_match
       |FROM (
       |${NgramEval.tokenF1PerKeySql(Seq("cand_id", "ref_id"),
        sidesSql(candsFrom, refsFrom))}
       |) q GROUP BY 1""".stripMargin
}
