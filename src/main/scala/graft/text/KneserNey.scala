package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995;
  * Chen & Goodman 1999, eq. 4.16-4.20) — the standard n-gram LM behind
  * perplexity-based corpus filtering (CCNet, Gopher). Complements
  * [[LmScore]]'s add-α model with the absolute-discounting +
  * continuation-probability formulation that actually ships in
  * production LM filters.
  *
  * Model (discount D, smoothing α):
  * {{{
  *   Pcont(w2)  = (N1+(·,w2) + α) / (N1+(·,·) + α·(Vcont + 1))
  *   P(w2|w1)   = max(c(w1,w2) − D, 0) / c(w1·)
  *              + D · N1+(w1,·) / c(w1·) · Pcont(w2)   when c(w1·) > 0
  *   P(w2|w1)   = Pcont(w2)                            unseen context
  * }}}
  * where c(w1·) is the train count of w1 as a bigram LEFT context,
  * N1+(w1,·) the distinct continuations of w1, N1+(·,w2) the distinct
  * contexts preceding w2, N1+(·,·) the distinct-bigram-type count, and
  * Vcont the continuation vocabulary. The continuation distribution is
  * itself add-α smoothed over Vcont + 1 outcomes (the +1 is the OOV
  * bucket), which makes the score TOTAL: a test bigram whose w2 never
  * ends any train bigram would otherwise get P = 0 → ln = −∞ under
  * textbook KN, and the unseen-context fallback is just Pcont itself —
  * no separate ad-hoc floor.
  *
  * Plan shape at 100 TB (same as [[LmScore]]): the train pass is three
  * count aggregates over one bigram explode (bigram counts; per-w1
  * context count + distinct continuations in one groupBy; per-w2
  * distinct contexts), each one map-combinable shuffle; the two global
  * scalars ride a 1-row broadcast; the test pass explodes once and
  * LEFT-joins the bounded count tables. Per-position log terms are
  * 6-dp-rounded and decimal-summed → aggregation-order-independent and
  * bit-identical to the DuckDB oracle.
  */
object KneserNey {

  /** Per-test-doc interpolated-KN bigram stats:
    * (doc_id, n_bigrams, sum_kn_logprob, avg_kn_logprob). Train/test
    * split = [[CorpusPipeline.trainTestSplit]]'s hash split. */
  def bigramKn(docs: DataFrame, trainFrac: Double = 0.9,
      discount: Double = 0.75, alpha: Double = 0.5): DataFrame = {
    val withSplit = docs.withColumn("split",
      CorpusPipeline.splitExpr(trainFrac))
    def bigrams(df: DataFrame): DataFrame = df
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val train = bigrams(withSplit.filter(col("split") === "train"))
    val test = bigrams(withSplit.filter(col("split") === "test"))
    // c2(w1,w2); from it: per-w1 context totals + distinct continuations,
    // per-w2 distinct contexts, and the two global scalars. Bigram-vocab
    // bounded and referenced FOUR ways — pinned so the train-fold
    // explode runs once (scan-censused 5 → 2 corpus scans, train+test)
    val c2 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val ctx = c2.groupBy("w1")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1_fwd"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("n1_bwd"))
    val globals = c2.agg(count(lit(1)).cast("double").as("n_bi"),
      countDistinct(col("w2")).cast("double").as("v_cont"))
    val d = lit(discount)
    val seen = coalesce(col("c1"), lit(0L)) > 0
    val pCont =
      (coalesce(col("n1_bwd"), lit(0L)).cast("double") + alpha) /
        (col("n_bi") + lit(alpha) * (col("v_cont") + lit(1.0)))
    val pSeen =
      greatest(coalesce(col("c2"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("c1").cast("double") +
        d * col("n1_fwd").cast("double") / col("c1").cast("double") * pCont
    test
      .join(c2, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(globals))
      .withColumn("term", round(log(when(seen, pSeen).otherwise(pCont)), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("term").cast("decimal(38,6)")).cast("double").as("sum_kn_logprob"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_kn_logprob"),
        (col("sum_kn_logprob") / col("n_bigrams").cast("double")).as("avg_kn_logprob"))
  }

  /** DuckDB oracle: identical split, counts, discounting, fallback, and
    * rounding (expression trees match term-for-term so the doubles are
    * bit-identical before the 6-dp round). */
  def bigramKnSql(trainFrac: Double = 0.9, discount: Double = 0.75,
      alpha: Double = 0.5): String =
    s"""WITH split AS (${CorpusPipeline.trainTestSplitSql(trainFrac)}),
       |docs2 AS (SELECT d.doc_id, s.split, string_split(d.text, ' ') AS ws
       |          FROM documents d JOIN split s USING (doc_id)),
       |train_bg AS (
       |  SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2,
       |         CAST(count(*) AS BIGINT) AS c2
       |  FROM docs2, unnest(generate_series(1, len(ws) - 1)) t(i)
       |  WHERE split = 'train' AND len(ws) >= 2
       |  GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
       |               CAST(count(*) AS BIGINT) AS n1_fwd
       |        FROM train_bg GROUP BY 1),
       |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_bwd
       |         FROM train_bg GROUP BY 1),
       |g AS (SELECT CAST(count(*) AS DOUBLE) AS n_bi,
       |             CAST(count(DISTINCT w2) AS DOUBLE) AS v_cont
       |      FROM train_bg),
       |test_bg AS (
       |  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       |  FROM docs2, unnest(generate_series(1, len(ws) - 1)) t(i)
       |  WHERE split = 'test' AND len(ws) >= 2),
       |terms AS (
       |  SELECT t.doc_id,
       |    round(ln(CASE WHEN COALESCE(ctx.c1, 0) > 0 THEN
       |      greatest(CAST(COALESCE(bg.c2, 0) AS DOUBLE) - $discount, 0.0)
       |        / CAST(ctx.c1 AS DOUBLE)
       |      + $discount * CAST(ctx.n1_fwd AS DOUBLE) / CAST(ctx.c1 AS DOUBLE)
       |        * ((CAST(COALESCE(cont.n1_bwd, 0) AS DOUBLE) + $alpha)
       |           / (g.n_bi + $alpha * (g.v_cont + 1.0)))
       |    ELSE
       |      (CAST(COALESCE(cont.n1_bwd, 0) AS DOUBLE) + $alpha)
       |        / (g.n_bi + $alpha * (g.v_cont + 1.0))
       |    END), 6) AS term
       |  FROM test_bg t
       |  LEFT JOIN train_bg bg ON t.w1 = bg.w1 AND t.w2 = bg.w2
       |  LEFT JOIN ctx ON t.w1 = ctx.w1
       |  LEFT JOIN cont ON t.w2 = cont.w2
       |  CROSS JOIN g)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS sum_kn_logprob,
       |  CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS avg_kn_logprob
       |FROM terms GROUP BY 1""".stripMargin
}
