package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial naive-Bayes text classifier, trained AND scored inside
  * the engine — the "can the data stack train the baseline model
  * without exporting?" proof. Train: per-label token counts with
  * Laplace smoothing off the hash-split train fold (the same md5-60
  * split the corpus pipeline uses, so folds are leakage-free and
  * reproducible). Score: every test token occurrence joins the
  * vocab×labels model, per-(doc, label) log-likelihoods fold, argmax.
  *
  * Scale shape: one token scan per fold; the model is vocab×L rows
  * (built with a ≤L-row broadcast label cross, never a corpus
  * product); scoring is a vocab-keyed equi join + one (doc, label)
  * groupBy. Tokens outside the train vocab are IGNORED (the standard
  * choice — they carry no class signal under Laplace smoothing).
  *
  * Exactness: every log-likelihood ln((c+1)/(T_l+V)) and log-prior is
  * rounded to 6 dp then summed as decimal(38,6) (associative → engine-
  * order-proof); occurrence multiplicity scales the exact decimal by a
  * long. Argmax ties break on label asc. The confusion rollup is pure
  * long counts.
  */
object NaiveBayes {

  /** A/B hook for the two eager model-frame pins below (results are
    * IDENTICAL either way — pins only change materialization):
    * SPARK_GRAFT_NB_PIN=off disables them, so pin cost can be measured
    * against re-derivation cost in the same binary under the same
    * ambient (r10 verdict item 6; measurement in PLANS_NOTES). */
  private def pin(df: DataFrame): DataFrame =
    if (sys.env.get("SPARK_GRAFT_NB_PIN").contains("off")) df
    else df.localCheckpoint(true)

  /** Train on the `trainFrac` md5-hash fold of `docs`, score the rest;
    * return the test-fold confusion matrix
    * (true_label, pred_label, n_docs). Test docs containing ZERO
    * in-vocab tokens drop out (no evidence, no prediction) — mirrored
    * by the oracle's inner join, so parity covers the edge. */
  def confusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainFrac: Double = 0.8): DataFrame = {
    val dec = "decimal(38,6)"
    // the corpus pipeline's md5-60 fold trick, parameterized by idCol
    val thresh = (trainFrac * 1152921504606846976L.toDouble).toLong // 2^60
    val withSplit = docs.withColumn("_split",
      when(conv(substring(md5(col(idCol).cast("string").cast("binary")),
        1, 15), 16, 10).cast("long") < thresh, "train").otherwise("test"))
    // per-fold tokenization — each fold's explode executes exactly
    // once (train feeds only the pinned `counts`, test feeds only the
    // scoring join), and the token-level frame is never materialized
    // (pinning it measured SLOWER than the explode at sf0.1, and at
    // scale it is the largest intermediate in the query)
    val toks = (df: DataFrame) => df.select(col(idCol).as("_id"),
        col(labelCol).as("_lab"),
        explode(split(col(textCol), " ")).as("_tok"))
      .filter(col("_tok") =!= "")
      .groupBy(col("_id"), col("_lab"), col("_tok"))
      .agg(count(lit(1)).as("_mult"))
    val train = toks(withSplit.filter(col("_split") === "train"))
    val test = toks(withSplit.filter(col("_split") === "test"))

    // model: (token, label) → ln((cnt+1)/(T_l + V)), on the FULL
    // vocab × label cross so zero-count cells carry the smoothed mass.
    // vocab-×-label bounded — pin it: vocab, V, and T_l all derive,
    // so the train-fold explode runs once, not four times
    // (scan-censused: 7 source scans before these moves, 3 after)
    val counts = pin(train.groupBy(col("_tok"), col("_lab"))
      .agg(sum(col("_mult")).as("_cnt")))
    val vocab = counts.select(col("_tok")).distinct()
    val vocabSize = vocab.agg(count(lit(1)).as("_v"))
    // Σ_tok cnt per label ≡ Σ mult over the train fold — same longs,
    // no extra pass over the token frame
    val labelTotals = counts.groupBy(col("_lab"))
      .agg(sum(col("_cnt")).as("_tl"))
    val model = vocab
      .crossJoin(broadcast(labelTotals)) // ≤L-row label side
      .crossJoin(broadcast(vocabSize))   // 1-row vocab size
      .join(counts, Seq("_tok", "_lab"), "left")
      .withColumn("_loglik",
        round(log((coalesce(col("_cnt"), lit(0L)) + 1).cast("double") /
          (col("_tl") + col("_v")).cast("double")), 6).cast(dec))
      .select(col("_tok"), col("_lab").as("_mlab"), col("_loglik"))

    // ln prior per label from train doc counts — counted at DOC level
    // from the source (token-less docs still count); ≤L rows, pinned
    // because the prior-total crossJoin reads it twice
    val nTrainDocs = pin(withSplit.filter(col("_split") === "train")
      .groupBy(col(labelCol).as("_mlab"))
      .agg(count(lit(1)).as("_nd")))
    val priors = nTrainDocs
      .crossJoin(broadcast(
        nTrainDocs.agg(sum(col("_nd")).as("_ndtot")))) // 1-row total
      .withColumn("_logprior",
        round(log(col("_nd").cast("double") / col("_ndtot").cast("double")),
          6).cast(dec))
      .select(col("_mlab"), col("_logprior"))

    val scored = test
      .join(model, Seq("_tok")) // inner: OOV tokens ignored
      .groupBy(col("_id"), col("_lab"), col("_mlab"))
      .agg(sum(col("_mult").cast(dec) * col("_loglik")).as("_ll"))
      .join(broadcast(priors), Seq("_mlab"))
      .withColumn("_score", col("_ll") + col("_logprior"))
    val pred = scored
      .groupBy(col("_id"), col("_lab"))
      .agg(min_by(col("_mlab"),
        struct((-col("_score")).as("s"), col("_mlab").as("l"))).as("_pred"))
    pred.groupBy(col("_lab").as("true_label"), col("_pred").as("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** DuckDB mirror of [[confusion]]. */
  def confusionSql(srcSql: String, idSql: String, textSql: String,
      labelSql: String, trainFrac: Double = 0.8): String = {
    val thresh = (trainFrac * (1L << 60).toDouble).toLong
    s"""WITH src AS (
       |  SELECT $idSql AS id, $textSql AS text, $labelSql AS lab,
       |    CASE WHEN CAST('0x' || substr(md5(CAST($idSql AS VARCHAR)), 1, 15)
       |              AS BIGINT) < $thresh THEN 'train' ELSE 'test' END AS split
       |  FROM ($srcSql) raw),
       |toks AS (
       |  SELECT id, lab, split, w.tok, CAST(COUNT(*) AS BIGINT) AS mult
       |  FROM src, unnest(string_split(text, ' ')) w(tok)
       |  WHERE w.tok <> '' GROUP BY 1, 2, 3, 4),
       |counts AS (
       |  SELECT tok, lab, CAST(SUM(mult) AS BIGINT) AS cnt
       |  FROM toks WHERE split = 'train' GROUP BY 1, 2),
       |vocab AS (SELECT DISTINCT tok FROM counts),
       |vocab_size AS (SELECT COUNT(*) AS v FROM vocab),
       |label_totals AS (
       |  SELECT lab, CAST(SUM(mult) AS BIGINT) AS tl
       |  FROM toks WHERE split = 'train' GROUP BY 1),
       |model AS (
       |  SELECT vb.tok, lt.lab AS mlab,
       |    CAST(round(ln(CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE) /
       |      CAST(lt.tl + vs.v AS DOUBLE)), 6) AS DECIMAL(38,6)) AS loglik
       |  FROM vocab vb CROSS JOIN label_totals lt CROSS JOIN vocab_size vs
       |  LEFT JOIN counts c ON c.tok = vb.tok AND c.lab = lt.lab),
       |n_train AS (
       |  SELECT lab AS mlab, COUNT(*) AS nd FROM src
       |  WHERE split = 'train' GROUP BY 1),
       |priors AS (
       |  SELECT mlab, CAST(round(ln(CAST(nd AS DOUBLE) /
       |    CAST((SELECT SUM(nd) FROM n_train) AS DOUBLE)), 6)
       |    AS DECIMAL(38,6)) AS logprior
       |  FROM n_train),
       |scored AS (
       |  SELECT t.id, t.lab, m.mlab,
       |    SUM(CAST(t.mult AS DECIMAL(38,6)) * m.loglik) + MAX(p.logprior)
       |      AS score
       |  FROM toks t JOIN model m ON t.tok = m.tok
       |  JOIN priors p ON m.mlab = p.mlab
       |  WHERE t.split = 'test'
       |  GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT id, lab, mlab AS pred_lab FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id
       |      ORDER BY score DESC, mlab) AS rk
       |    FROM scored) t
       |  WHERE rk = 1)
       |SELECT lab AS true_label, pred_lab AS pred_label,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM pred GROUP BY 1, 2""".stripMargin
  }
}
