package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.GopherRules

/** Model-based quality filtering (the FineWeb-Edu / DCLM recipe,
  * Penedo et al. 2024; Li et al. 2024): train a cheap linear
  * classifier on weak quality labels, score EVERY document with it,
  * and filter on the model score instead of the raw rules — the model
  * generalizes the rule battery to a smooth score. Here the weak
  * labels are the gated [[graft.text.GopherRules]] verdict, the
  * classifier is the gated integer-exact [[LogregGd]] (hard-sigmoid
  * GD over sufficient statistics), and the report is the
  * per-language label/prediction agreement rollup.
  *
  * One lazy plan: gopher audit (scan-absorbed projection) → 3 GD
  * iterations (each a 1-row weight broadcast + one d+1-column
  * aggregate) → score+threshold (stateless map against the broadcast
  * weight row) → rollup. The corpus is never shuffled; every
  * quantity is integer-exact per the LogregGd contract, so the gate
  * is oracle-hash-exact end to end, trained model included.
  */
object QualityClassifier {

  /** Integer feature frame from the Gopher audit: y = keep verdict,
    * features CENTERED at the rule boundaries (word count − 50,
    * stopword hits − 2, floor(10·mean word length) − 30) — centering
    * conditions the full-batch GD so the hard sigmoid doesn't
    * oscillate into a degenerate all-one/all-zero model (measured:
    * uncentered features collapse to pred≡0 at sf0.01 for most
    * learning rates; centered ones are stable at ~81% label agreement
    * across both gate SFs and a 10× lrDen range). The ·10
    * integerization floors one IEEE product, engine-identical per the
    * LogregGd contract. */
  private def features(docs: DataFrame): DataFrame =
    GopherRules.audit(docs)
      .select(col("doc_id"),
        when(col("keep"), 1L).otherwise(0L).as("y"),
        lit(1L).as("x0"),
        (col("word_count") - 50).as("x1"),
        (col("stopword_hits") - 2).as("x2"),
        (floor(col("mean_word_len") * lit(10.0)).cast("long") - 30).as("x3"))

  /** Per-language agreement report: (lang, n_docs, n_label_keep,
    * n_pred_keep, n_agree). Prediction = hard-sigmoid score strictly
    * above 1/2 (pq > W/2). */
  def classify(docs: DataFrame, iters: Int = 3,
      lrDen: Long = 500L): DataFrame = {
    // 6 longs per doc; referenced by BOTH the trainer and the scoring
    // branch — without the checkpoint the regex-heavy Gopher audit
    // executes once per reference (censused: 6 documents scans).
    val feats = features(docs).localCheckpoint(true)
    // materialize = false: feats is already pinned above; a second
    // checkpoint of the same 5 columns would double executor storage
    val w = LogregGd.trainWeights(feats.select("y", "x0", "x1", "x2", "x3"),
      iters, lrDen, materialize = false)
    val W = LogregGd.W
    val scored = feats.crossJoin(broadcast(w))
      .withColumn("_z",
        Seq("x0", "x1", "x2", "x3").map(f => col(s"w_$f") * col(f))
          .reduce(_ + _))
      .withColumn("_pq",
        least(greatest(
          floor((col("_z") + lit(2L * W)) / lit(4.0)).cast("long"),
          lit(0L)), lit(W)))
      .withColumn("pred", (col("_pq") > lit(W / 2)).cast("long"))
    scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_label_keep"),
        sum(col("pred")).as("n_pred_keep"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_agree"))
  }

  /** DuckDB mirror: gopher features → the unrolled GD chain → the
    * same hard-sigmoid threshold and rollup. */
  def classifySql(iters: Int = 3, lrDen: Long = 500L): String = {
    val W = LogregGd.W
    val featsSql =
      s"""SELECT doc_id,
         |  CASE WHEN keep THEN 1 ELSE 0 END AS y,
         |  CAST(1 AS BIGINT) AS x0,
         |  word_count - 50 AS x1,
         |  stopword_hits - 2 AS x2,
         |  CAST(floor(mean_word_len * 10.0) AS BIGINT) - 30 AS x3
         |FROM (${GopherRules.auditSql("documents")}) ga""".stripMargin
    s"""WITH feats AS ($featsSql),
       |${LogregGd.trainCtes("SELECT y, x0, x1, x2, x3 FROM feats", iters, lrDen)},
       |scored AS (
       |  SELECT f.doc_id, f.y,
       |    CASE WHEN least(greatest(CAST(floor((
       |        (w.w_x0 * f.x0 + w.w_x1 * f.x1 + w.w_x2 * f.x2 + w.w_x3 * f.x3)
       |        + ${2L * W}) / 4.0) AS BIGINT), 0), $W) > ${W / 2}
       |      THEN 1 ELSE 0 END AS pred
       |  FROM feats f, w$iters w)
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(s.y) AS BIGINT) AS n_label_keep,
       |  CAST(SUM(s.pred) AS BIGINT) AS n_pred_keep,
       |  CAST(SUM(CASE WHEN s.pred = s.y THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_agree
       |FROM scored s JOIN documents d USING (doc_id)
       |GROUP BY 1""".stripMargin
  }
}
