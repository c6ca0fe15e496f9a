package graft.queries

import org.apache.spark.sql.functions._
import QueryDsl._

/** Model-evaluation, product-analytics, and recommender gates — the
  * post-training scoring surface of the pipeline (SURVEY §2.9 scope:
  * operations a large-scale training-data stack needs beyond the
  * reference's own notebooks). Every entry carries an exact DuckDB
  * oracle; see the op scaladocs for the integer-sufficient-statistic
  * exactness arguments.
  */
object MlQueries {

  /** Exact grouped ROC-AUC (tied-rank Mann–Whitney) — label = returned
    * line, score = quantity (heavily tied, exercising the average-rank
    * path), grouped by line status. */
  private val mlAucRoc: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_lab", col("l_returnflag") === "R")
      .transform(df => graft.ml.Eval.aucRoc(df, "l_linestatus",
        "l_quantity", "_lab"))
      .withColumnRenamed("l_linestatus", "grp")

  private val mlAucRocSql = graft.ml.Eval.aucRocSql(
    "SELECT * FROM lineitem", "l_linestatus", "l_quantity",
    "l_returnflag = 'R'")

  /** Decile gains/lift table over extendedprice ranking, positives =
    * returned lines; rides GlobalRank (no single-partition window). */
  private val mlGainsTable: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_lab", col("l_returnflag") === "R")
      .withColumn("_tie", expr("l_orderkey * 10 + l_linenumber"))
      .transform(df => graft.ml.Eval.gains(df, "l_extendedprice", "_tie",
        "_lab", buckets = 10))

  private val mlGainsTableSql = graft.ml.Eval.gainsSql(
    "SELECT *, l_orderkey * 10 + l_linenumber AS tie FROM lineitem",
    "l_extendedprice", "tie", "l_returnflag = 'R'", buckets = 10)

  /** Daily cohort retention matrix over the events table. */
  private val aCohortRetention: Q = (s, d) =>
    graft.ops.Cohort.retention(events(s, d), "user_id", "ev_us",
      86400000000L)

  private val aCohortRetentionSql = graft.ops.Cohort.retentionSql(
    s"SELECT user_id, $evUsSql AS ev_us FROM events", "user_id", "ev_us",
    86400000000L)

  /** 2-D skyline: parts on the (retailprice, size) Pareto frontier —
    * bucketed distributed form vs the oracle's quadratic NOT EXISTS. */
  private val oSkylinePareto: Q = (s, d) =>
    graft.ops.Skyline.frontier(
      table(s, d, "part").select(col("p_partkey"), col("p_retailprice"),
        col("p_size")),
      "p_retailprice", "p_size")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))

  private val oSkylineParetoSql = graft.ops.Skyline.frontierSql(
    "SELECT p_partkey, p_retailprice, p_size FROM part",
    "p_retailprice", "p_size", "p.p_partkey, p.p_retailprice, p.p_size")

  /** Item-item co-purchase top-3 (cosine over basket incidence) with a
    * hard basket cap of 5 distinct items — the pair-explosion guard —
    * deliberately low enough that real baskets drop, so the gate
    * proves cap parity too. */
  private val recItemSimilarity: Q = (s, d) =>
    graft.sim.ItemSim.topkCosine(table(s, d, "lineitem"),
      "l_orderkey", "l_partkey", k = 3, maxBasket = 5)

  private val recItemSimilaritySql = graft.sim.ItemSim.topkCosineSql(
    "SELECT * FROM lineitem", "l_orderkey", "l_partkey",
    k = 3, maxBasket = 5)

  /** Per-order retrieval metrics: candidates = lines ranked by price
    * (tie: linenumber), relevant = returned lines; P@3 / MRR@3 /
    * nDCG@3 per order. */
  private val mlRankingMetrics: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_rel", col("l_returnflag") === "R")
      .transform(df => graft.ml.Eval.rankingMetrics(df, "l_orderkey",
        "l_extendedprice", "l_linenumber", "_rel", k = 3))

  private val mlRankingMetricsSql = graft.ml.Eval.rankingMetricsSql(
    "SELECT * FROM lineitem", "l_orderkey", "l_extendedprice",
    "l_linenumber", "l_returnflag = 'R'", k = 3)

  /** χ² most-discriminative tokens per language over documents. */
  private val textChi2Terms: Q = (s, d) =>
    graft.text.FeatureSelect.chi2Terms(table(s, d, "documents"),
      "doc_id", "text", "lang", k = 15, minDf = 3L)

  private val textChi2TermsSql = graft.text.FeatureSelect.chi2TermsSql(
    "SELECT * FROM documents", "doc_id", "text", "lang", k = 15, minDf = 3L)

  /** Naive-Bayes language classifier trained on the 80% md5 fold,
    * test-fold confusion matrix. */
  private val mlNaiveBayes: Q = (s, d) =>
    graft.text.NaiveBayes.confusion(table(s, d, "documents"),
      "doc_id", "text", "lang", trainFrac = 0.8)

  private val mlNaiveBayesSql = graft.text.NaiveBayes.confusionSql(
    "SELECT * FROM documents", "doc_id", "text", "lang", trainFrac = 0.8)

  /** CUSUM drift alerts per event_type over the value stream (time
    * order, event_id tiebreak). */
  private val wCusumAlerts: Q = (s, d) =>
    graft.ops.Cusum.detect(
      events(s, d).select(col("event_type"), col("ev_us"), col("event_id"),
        col("value")),
      "event_type", "ev_us", "event_id", "value",
      target = 50.0, slack = 5.0, h = 200.0)
      .withColumnRenamed("event_type", "k").withColumnRenamed("ev_us", "o")
      .withColumnRenamed("event_id", "tie").withColumnRenamed("value", "v")

  private val wCusumAlertsSql = graft.ops.Cusum.detectSql(
    s"SELECT event_type, $evUsSql AS ev_us, event_id, value FROM events",
    "event_type", "ev_us", "event_id", "value",
    target = 50.0, slack = 5.0, h = 200.0)

  /** Daily DAU / trailing-7 WAU / stickiness over events. */
  private val aActiveStickiness: Q = (s, d) =>
    graft.ops.ActiveUsers.stickiness(events(s, d), "user_id", "ev_us",
      86400000000L, w = 7)

  private val aActiveStickinessSql = graft.ops.ActiveUsers.stickinessSql(
    s"SELECT user_id, $evUsSql AS ev_us FROM events", "user_id", "ev_us",
    86400000000L, w = 7)

  /** Quantile-normalize extendedprice within each return flag onto the
    * corpus-global distribution — integer-exact order-statistic map. */
  private val wQuantileNormalize: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_id", expr("l_orderkey * 10 + l_linenumber"))
      .select(col("_id"), col("l_returnflag"), col("l_extendedprice"))
      .transform(df => graft.ops.QuantileNorm.toGlobalReference(
        df, "l_returnflag", "l_extendedprice", "_id"))

  private val wQuantileNormalizeSql =
    graft.ops.QuantileNorm.toGlobalReferenceSql(
      """SELECT l_orderkey * 10 + l_linenumber AS id, l_returnflag,
        |l_extendedprice FROM lineitem""".stripMargin,
      "l_returnflag", "l_extendedprice", "id",
      "g.id AS _id, g.l_returnflag, g.l_extendedprice")

  /** Full-batch GD logistic regression (hard-sigmoid surrogate) on
    * integerized lineitem features: predict "returned line" from
    * (bias, quantity, discount·100, tax·100). The ·100 integerization
    * floors the IEEE product — engine-identical on both sides, per the
    * LogregGd exactness contract. */
  private val mlLogregGd: Q = (s, d) =>
    graft.ml.LogregGd.train(
      table(s, d, "lineitem").select(
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
        lit(1L).as("x0"),
        floor(col("l_quantity")).cast("long").as("x1"),
        floor(col("l_discount") * lit(100.0)).cast("long").as("x2"),
        floor(col("l_tax") * lit(100.0)).cast("long").as("x3")),
      iters = 3)

  private val mlLogregGdSql = graft.ml.LogregGd.trainSql(
    """SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |  CAST(1 AS BIGINT) AS x0,
      |  CAST(floor(l_quantity) AS BIGINT) AS x1,
      |  CAST(floor(l_discount * 100.0) AS BIGINT) AS x2,
      |  CAST(floor(l_tax * 100.0) AS BIGINT) AS x3
      |FROM lineitem""".stripMargin, iters = 3)

  /** Calibration + exact Brier over a quantized score head: k ∈ [0,100]
    * from the order keys, label = returned line. */
  private val mlCalibration: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_k", (col("l_orderkey") * 31 + col("l_linenumber") * 7) % 101)
      .withColumn("_lab", col("l_returnflag") === "R")
      .transform(df => graft.ml.Eval.calibration(df, "_k", 100, "_lab", 10))

  private val mlCalibrationSql = graft.ml.Eval.calibrationSql(
    "SELECT * FROM lineitem",
    "(l_orderkey * 31 + l_linenumber * 7) % 101", 100,
    "l_returnflag = 'R'", 10)

  /** Per-status confusion matrix / precision / recall / F1 for the
    * thresholded quantized score. */
  private val mlConfusionF1: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_pred",
        (col("l_orderkey") * 31 + col("l_linenumber") * 7) % 101 >= 50)
      .withColumn("_lab", col("l_returnflag") === "R")
      .transform(df => graft.ml.Eval.confusionF1(df, "l_linestatus",
        "_pred", "_lab"))
      .withColumnRenamed("l_linestatus", "grp")

  private val mlConfusionF1Sql = graft.ml.Eval.confusionF1Sql(
    "SELECT * FROM lineitem", "l_linestatus",
    "(l_orderkey * 31 + l_linenumber * 7) % 101 >= 50",
    "l_returnflag = 'R'")

  /** Inter-annotator agreement (Cohen's κ) between two deterministic
    * raters over events, grouped by event type — the label-quality
    * audit run before trusting a crowd batch. */
  private val mlCohensKappa: Q = (s, d) =>
    events(s, d)
      .withColumn("_r1", col("event_id") % 7 < 3)
      .withColumn("_r2", (col("event_id") % 7 < 3) === (col("event_id") % 9 < 6))
      .transform(df => graft.ml.Eval.cohensKappa(df, "event_type",
        "_r1", "_r2"))
      .withColumnRenamed("event_type", "grp")

  private val mlCohensKappaSql = graft.ml.Eval.cohensKappaSql(
    "SELECT * FROM events", "event_type",
    "event_id % 7 < 3",
    "(event_id % 7 < 3) = (event_id % 9 < 6)")

  /** LTTB-style trace downsampling: one visual representative per
    * 30-minute bucket per user over the events value channel. */
  private val wLttbDownsample: Q = (s, d) =>
    graft.ops.Lttb.downsample(events(s, d), "user_id", "ev_us", "value",
      "event_id", 1800000000L)

  private val wLttbDownsampleSql = graft.ops.Lttb.downsampleSql(
    s"SELECT user_id, event_id, value, $evUsSql AS ev_us FROM events",
    "user_id", "ev_us", "value", "event_id", 1800000000L)

  /** PCA over the embedding corpus: exact quantized covariance fold →
    * driver eigensolve → shipped loading table / fused projection.
    * Rows-only (eigensolve has no SQL spelling); PcaSpec anchors it. */
  private val mlPca: Q = (s, d) => {
    import s.implicits._
    val ds = table(s, d, "embeddings").select(col("embedding"))
      .as[Array[Float]]
    graft.ml.Pca.modelFrame(s, graft.ml.Pca.fit(ds, k = 8))
  }

  /** PCA projection, oracle-exact via the engine-written-artifact
    * pattern (the unigram-encode precedent): the eigensolve stays the
    * documented engine-side float seam, but the engine WRITES its
    * (pc, mean, component) table to a per-corpus parquet path and
    * DuckDB replays the projection over it — `list_reduce` mirrors
    * Spark's `aggregate` fold op-for-op (same 0-init, same index
    * order, each step one correctly-rounded IEEE op), so the projected
    * values are bit-identical before the 6-dp dump rounding. */
  private def pcaModelPath(tag: String) = s"/tmp/graft_gate_pca_model_$tag"
  private val mlPcaProject: Q = (s, d) => {
    import s.implicits._
    val t = table(s, d, "embeddings")
    val m = graft.ml.Pca.fit(t.select(col("embedding")).as[Array[Float]], k = 4)
    s.createDataFrame(m.components.zipWithIndex.toSeq
        .map { case (w, c) => (c, m.mean.toSeq, w.toSeq) })
      .toDF("pc", "mu", "w")
      .coalesce(1).write.mode("overwrite")
      .parquet(pcaModelPath(graft.util.Tables.corpusTag(d)))
    graft.ml.Pca.project(t, "embedding", m)
      .select(col("vec_id") +:
        (0 until 4).map(i => round(col(s"pc$i"), 6).as(s"pc$i")): _*)
      .orderBy("vec_id")
  }

  private val mlPcaProjectSql = {
    val path =
      s"/tmp/graft_gate_pca_model_${graft.util.Tables.SfTagToken}/*.parquet"
    s"""WITH m AS (SELECT pc, mu, w FROM read_parquet('$path')),
       |proj AS (
       |  SELECT e.vec_id, m.pc,
       |    ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(e.embedding)),
       |        i -> (CAST(e.embedding[i] AS DOUBLE) - m.mu[i]) * m.w[i])),
       |      (acc, x) -> acc + x), 6) AS v
       |  FROM embeddings e, m)
       |SELECT vec_id,
       |  MAX(CASE WHEN pc = 0 THEN v END) AS pc0,
       |  MAX(CASE WHEN pc = 1 THEN v END) AS pc1,
       |  MAX(CASE WHEN pc = 2 THEN v END) AS pc2,
       |  MAX(CASE WHEN pc = 3 THEN v END) AS pc3
       |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** PLANTED-SPECTRUM PCA gate — the cross-engine anchor the free-data
    * `ml_pca` gate can't be: a 4-dim fixture whose columns are
    * amplitude-scaled Walsh ±1 patterns (x_c = A_c·(1−2·parity(t₁₆&A_c)),
    * A = 8,4,2,1, t₁₆ cycling over complete 16-row blocks), so the
    * EMPIRICAL covariance is exactly diagonal with planted spectrum
    * {64,16,4,1}: column sums are exactly 0 and cross-products cancel
    * exactly in integer arithmetic. The eigensystem is then
    * SQL-derivable WITHOUT an eigensolve — eigenvalues are the diagonal
    * (one exact-long→double cast + one divide, mirrored op-for-op) and
    * the principal axes are the coordinate axes, so the projection
    * variance table equals the raw column moments.
    *
    * The Spark side runs the REAL production path (CovSumsAgg fold →
    * power-iteration eigensolve → fused projection); power iteration on
    * an exactly-diagonal matrix with spectral ratios ≤ 1/4 converges to
    * the axes up to ~1 ulp in 200 iterations, so emitted figures are
    * quantized (round ·1e6 / ·1e9 — values sit ≥ 10 orders of magnitude
    * from any rounding boundary, documented safe). A hash match proves
    * the whole fit recovers a KNOWN spectrum, not merely that it is
    * deterministic.
    *
    * The 1-in-7 sample + complete-block truncation bounds n so the
    * quantized second moments stay far inside long range at any SF; the
    * global row_number is over the SAMPLED frame only (fixture
    * construction, not a corpus-path pattern). */
  private val mlPcaPlanted: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = events(s, d).filter(col("event_id") % 7 === 0)
      .select(col("event_id"))
    val nt = base.count() / 16 * 16
    val fx = base
      // non-foldable constant partition key — the repo's GlobalRank
      // idiom: same single-partition execution for this bounded
      // fixture, without the WindowExec warning
      .withColumn("rn", row_number().over(
        Window.partitionBy(pmod(col("event_id"), lit(1)))
          .orderBy(col("event_id"))))
      .filter(col("rn") <= nt)
      .withColumn("t16", (col("rn") - 1) % 16)
      .select(col("event_id").as("vec_id"),
        expr("""transform(array(8, 4, 2, 1),
                a -> cast(a * (1 - 2 * (bit_count(t16 & a) % 2)) as float))""")
          .as("emb"))
    val model = graft.ml.Pca.fit(fx.select(col("emb")).as[Array[Float]], k = 4)
    val modelDf = Seq.tabulate(4)(c => (c, model.eigenvalues(c),
      model.eigenvalues(c) / model.totalVar)).toDF("component", "eig", "ratio")
    val stats = graft.ml.Pca.project(fx, "emb", model)
      .select(explode(array((0 until 4).map(c =>
        struct(lit(c).as("component"),
          (col(s"pc$c") * col(s"pc$c")).as("sq"))): _*)).as("e"))
      .select(col("e.component"), col("e.sq"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n"), sum(col("sq")).as("ss"))
    modelDf.join(stats, "component")
      .select(col("component"),
        round(col("eig") * 1e6).cast("long").as("eig_q6"),
        round(col("ratio") * 1e9).cast("long").as("ratio_q9"),
        col("n"),
        round(col("ss")).cast("long").as("ss_round"),
        round(col("ss") / col("n") * lit(1e6)).cast("long").as("var_q6"))
  }

  private val mlPcaPlantedSql =
    """WITH base AS (
      |  SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn
      |  FROM events WHERE event_id % 7 = 0),
      |cut AS (SELECT (COUNT(*) // 16) * 16 AS nt FROM base),
      |t AS (
      |  SELECT (rn - 1) % 16 AS t16 FROM base, cut WHERE rn <= nt),
      |x AS (
      |  SELECT
      |    CAST(8 * (1 - 2 * (bit_count(CAST(t16 AS BIGINT) & 8) % 2)) AS BIGINT) AS x0,
      |    CAST(4 * (1 - 2 * (bit_count(CAST(t16 AS BIGINT) & 4) % 2)) AS BIGINT) AS x1,
      |    CAST(2 * (1 - 2 * (bit_count(CAST(t16 AS BIGINT) & 2) % 2)) AS BIGINT) AS x2,
      |    CAST(1 * (1 - 2 * (bit_count(CAST(t16 AS BIGINT) & 1) % 2)) AS BIGINT) AS x3
      |  FROM t),
      |mo AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(x0 * x0) AS BIGINT) AS ss0,
      |    CAST(SUM(x1 * x1) AS BIGINT) AS ss1,
      |    CAST(SUM(x2 * x2) AS BIGINT) AS ss2,
      |    CAST(SUM(x3 * x3) AS BIGINT) AS ss3
      |  FROM x),
      |lam AS (
      |  SELECT n, ss0, ss1, ss2, ss3,
      |    CAST(ss0 * 1000000000000 AS DOUBLE)
      |      / ((CAST(n AS DOUBLE) * 1000000.0) * 1000000.0) AS l0,
      |    CAST(ss1 * 1000000000000 AS DOUBLE)
      |      / ((CAST(n AS DOUBLE) * 1000000.0) * 1000000.0) AS l1,
      |    CAST(ss2 * 1000000000000 AS DOUBLE)
      |      / ((CAST(n AS DOUBLE) * 1000000.0) * 1000000.0) AS l2,
      |    CAST(ss3 * 1000000000000 AS DOUBLE)
      |      / ((CAST(n AS DOUBLE) * 1000000.0) * 1000000.0) AS l3
      |  FROM mo),
      |tv AS (SELECT *, ((l0 + l1) + l2) + l3 AS tot FROM lam)
      |SELECT 0 AS component, CAST(round(l0 * 1000000.0) AS BIGINT) AS eig_q6,
      |  CAST(round(l0 / tot * 1000000000.0) AS BIGINT) AS ratio_q9, n,
      |  ss0 AS ss_round,
      |  CAST(round(CAST(ss0 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT) AS var_q6
      |FROM tv
      |UNION ALL
      |SELECT 1, CAST(round(l1 * 1000000.0) AS BIGINT),
      |  CAST(round(l1 / tot * 1000000000.0) AS BIGINT), n, ss1,
      |  CAST(round(CAST(ss1 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT)
      |FROM tv
      |UNION ALL
      |SELECT 2, CAST(round(l2 * 1000000.0) AS BIGINT),
      |  CAST(round(l2 / tot * 1000000000.0) AS BIGINT), n, ss2,
      |  CAST(round(CAST(ss2 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT)
      |FROM tv
      |UNION ALL
      |SELECT 3, CAST(round(l3 * 1000000.0) AS BIGINT),
      |  CAST(round(l3 / tot * 1000000000.0) AS BIGINT), n, ss3,
      |  CAST(round(CAST(ss3 AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT)
      |FROM tv""".stripMargin

  /** Declarative publish-gate expectation suite over lineitem — mixed
    * passing and (deliberately) failing rules, folded in one pass. */
  private val expectationRules = {
    import graft.sources.Expectations._
    Seq(
      NotNull("l_shipdate"),
      Unique("l_orderkey", 0.2),
      InRange("l_quantity", 1, 50),
      InRange("l_discount", 0.0, 0.05), // fails: discounts reach 0.10
      InSet("l_returnflag", Seq("A", "N", "R")),
      MatchesRegex("l_linestatus", "^[OF]$"))
  }
  private val qualityExpectations: Q = (s, d) =>
    graft.sources.Expectations.evaluate(table(s, d, "lineitem"),
      expectationRules)
  private val qualityExpectationsSql =
    graft.sources.Expectations.evaluateSql("SELECT * FROM lineitem",
      expectationRules)

  /** Exact Pearson correlation matrix across the (integerized)
    * lineitem value channels — one aggregate on the codegen'd
    * long-sum path (values bounded, Σx·y far below 2⁶³; the
    * decimal-path `corrMatrix` stays available for unbounded inputs). */
  private val corrCols = Seq("q", "disc_c", "tax_c")
  private val aCorrMatrix: Q = (s, d) =>
    graft.sim.Covariance.corrMatrixLong(
      table(s, d, "lineitem").select(
        floor(col("l_quantity")).as("q"),
        floor(col("l_discount") * 100.0).as("disc_c"),
        floor(col("l_tax") * 100.0).as("tax_c")),
      corrCols)
  private val aCorrMatrixSql = graft.sim.Covariance.corrMatrixLongSql(
    """SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
      |  CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_c,
      |  CAST(floor(l_tax * 100.0) AS BIGINT) AS tax_c
      |FROM lineitem""".stripMargin, corrCols)

  /** Hourly seasonal decomposition of the per-type value stream with
    * 3σ residual anomaly flags (period = 24 h). */
  private val wSeasonalAnomaly: Q = (s, d) =>
    graft.ops.Seasonal.decompose(events(s, d), "event_type", "ev_us",
      "value", bucketUs = 3600000000L, period = 24)

  private val wSeasonalAnomalySql = graft.ops.Seasonal.decomposeSql(
    s"SELECT event_type, value, $evUsSql AS ev_us FROM events",
    "event_type", "ev_us", "value", bucketUs = 3600000000L, period = 24)

  /** Isotonic (PAV) calibration of the quantized score per line status.
    * Oracle'd via the minimax characterization of isotonic regression
    * (Isotonic.calibrateSql — PAV's VALUE is max-min over interval
    * averages, bit-exact through one IEEE divide per interval). */
  private val mlIsotonic: Q = (s, d) =>
    table(s, d, "lineitem")
      .withColumn("_k", (col("l_orderkey") * 31 + col("l_linenumber") * 7) % 101)
      .withColumn("_lab", col("l_returnflag") === "R")
      .transform(df => graft.ml.Isotonic.calibrate(df, "l_linestatus",
        "_k", "_lab"))

  private val mlIsotonicSql = graft.ml.Isotonic.calibrateSql(
    """SELECT CAST(l_linestatus AS VARCHAR) AS grp,
      |       (l_orderkey * 31 + l_linenumber * 7) % 101 AS k,
      |       COUNT(*) AS n,
      |       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |            AS BIGINT) AS pos
      |FROM lineitem GROUP BY 1, 2""".stripMargin)

  /** Record linkage: reconcile a perturbed customer feed (1-in-7
    * sample) against the full canonical table. NB the TPC-H name
    * template ("Customer#000…") is adversarial for ANY lossless
    * scheme — neighbor keys are genuine distance-1 matches, so the
    * true near-pair density (what candidates must cover) is itself
    * O(probes × digit-neighbors); the probe sample keeps the gate a
    * correctness check rather than a worst-case-density stress run. */
  private val jRecordLinkage: Q = (s, d) => {
    val cust = table(s, d, "customer")
    val probe = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_nationkey"),
        when(col("c_custkey") % 3 === 0,
          concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X")))
          .when(col("c_custkey") % 5 === 0, concat(lit("Z"), col("c_name")))
          .otherwise(col("c_name")).as("c_name"))
    graft.ops.RecordLinkage.bestMatch(probe, cust,
      probeKey = "c_custkey", refKey = "c_custkey", nameCol = "c_name",
      blockCols = Seq("c_nationkey"), maxEdit = 2)
  }

  private val jRecordLinkageSql = graft.ops.RecordLinkage.bestMatchSql(
    probeSql = """SELECT c_custkey, c_nationkey,
                 |  CASE WHEN c_custkey % 3 = 0
                 |         THEN substring(c_name, 1, length(c_name) - 1) || 'X'
                 |       WHEN c_custkey % 5 = 0 THEN 'Z' || c_name
                 |       ELSE c_name END AS c_name
                 |FROM customer WHERE c_custkey % 7 = 0""".stripMargin,
    refSql = "SELECT c_custkey, c_nationkey, c_name FROM customer",
    probeKey = "c_custkey", refKey = "c_custkey", nameCol = "c_name",
    blockCols = Seq("c_nationkey"), maxEdit = 2)

  /** Next-event-prediction training examples: per user, the previous 3
    * event types (history window) → current type (label), with a
    * deterministic hash split — the sequence-model dataset builder.
    * One keyed window on the user shuffle; rows with incomplete
    * history are dropped (no padding tokens to disagree over). */
  private val pipelineNextEvent: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ev_us"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("ev_us"), col("event_id"),
        col("event_type"))
      .withColumn("h1", lag(col("event_type"), 1).over(w))
      .withColumn("h2", lag(col("event_type"), 2).over(w))
      .withColumn("h3", lag(col("event_type"), 3).over(w))
      .filter(col("h3").isNotNull)
      .select(col("user_id"), col("event_id"),
        concat_ws(">", col("h3"), col("h2"), col("h1")).as("history"),
        col("event_type").as("label"),
        when(substring(md5(concat_ws("_", col("user_id"), col("event_id"))),
          1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
          "a", "b"), "train").otherwise("eval").as("split"))
  }

  private val pipelineNextEventSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, $evUsSql AS ev_us
       |  FROM events),
       |h AS (
       |  SELECT user_id, event_id, event_type,
       |    lag(event_type, 1) OVER w AS h1,
       |    lag(event_type, 2) OVER w AS h2,
       |    lag(event_type, 3) OVER w AS h3
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ev_us, event_id))
       |SELECT user_id, event_id,
       |  h3 || '>' || h2 || '>' || h1 AS history,
       |  event_type AS label,
       |  CASE WHEN substring(md5(user_id || '_' || event_id), 1, 1)
       |    IN ('0','1','2','3','4','5','6','7','8','9','a','b')
       |    THEN 'train' ELSE 'eval' END AS split
       |FROM h WHERE h3 IS NOT NULL""".stripMargin

  /** Pairwise association rules over order baskets (same cap as the
    * co-occurrence recommender). */
  private val recAssociationRules: Q = (s, d) =>
    graft.sim.ItemSim.associationRules(table(s, d, "lineitem"),
      "l_orderkey", "l_partkey", minPairCount = 2L, maxBasket = 5)

  private val recAssociationRulesSql = graft.sim.ItemSim.associationRulesSql(
    "SELECT * FROM lineitem", "l_orderkey", "l_partkey",
    minPairCount = 2L, maxBasket = 5)

  /** Poisson-bootstrap 90% CI for mean quantity per return flag —
    * uncertainty quantification without resampling shuffles. Gate runs
    * on a 1-in-10 orderkey sample: the per-(row, replicate) md5 draw is
    * the honest cross-engine randomness but the slowest expression in
    * the suite (native xxhash64 is ~25× faster — measured in
    * PLANS_NOTES — and is what a Spark-only deployment would use), so
    * the gate bounds its md5 volume while exercising the full op. */
  private val aBootstrapCi: Q = (s, d) =>
    graft.ops.Bootstrap.meanCi(
      table(s, d, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .withColumn("_id", expr("l_orderkey * 10 + l_linenumber")),
      "l_returnflag", "l_quantity", "_id", b = 50,
      loPct = 0.05, hiPct = 0.95, integerValued = true)

  private val aBootstrapCiSql = graft.ops.Bootstrap.meanCiSql(
    """SELECT *, l_orderkey * 10 + l_linenumber AS id FROM lineitem
      |WHERE l_orderkey % 10 = 0""".stripMargin,
    "l_returnflag", "l_quantity", "id", b = 50,
    loPct = 0.05, hiPct = 0.95, integerValued = true)

  /** The bootstrap's PRODUCTION hash path at FULL volume: same Poisson
    * bootstrap, but the per-(row, replicate) draw rides the native
    * codegen'd xxhash64 instead of the cross-engine md5 chain, and the
    * 1-in-10 orderkey sample is dropped. Rows-only gate (DuckDB lacks
    * xxhash64): the draw is anchored by BootstrapSpec instead —
    * n/mean must equal the md5 twin's exactly (randomness-independent),
    * the draw is partitioning-invariant, and the intervals bracket the
    * mean. This is the deployment path whose cost/exponent SCALING.json
    * tracks; the md5 twin above remains the cross-engine witness. */
  private val aBootstrapCiFast: Q = (s, d) =>
    graft.ops.Bootstrap.meanCi(
      table(s, d, "lineitem")
        .withColumn("_id", expr("l_orderkey * 10 + l_linenumber")),
      "l_returnflag", "l_quantity", "_id", b = 50,
      loPct = 0.05, hiPct = 0.95, integerValued = true, fastHash = true)

  /** Gini coefficient of quantity per return flag — the
    * value-concentration skew metric (who holds the volume), via the
    * rank identity G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) over the keyed
    * (value, id) rank: pure long sums, one divide. */
  private val aGini: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("q"), col("_id"))
    table(s, d, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("q"),
        expr("l_orderkey * 10 + l_linenumber").as("_id"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("i") * col("q")).as("_siv"),
        sum(col("q")).as("_sv"))
      .withColumn("gini",
        (lit(2L) * col("_siv") - (col("n") + 1L) * col("_sv")).cast("double") /
          (col("n") * col("_sv")).cast("double"))
      .select(col("grp"), col("n"), col("gini"))
  }

  private val aGiniSql =
    """WITH r AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(floor(l_quantity) AS BIGINT) AS q,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY CAST(floor(l_quantity) AS BIGINT),
      |               l_orderkey * 10 + l_linenumber) AS i
      |  FROM lineitem),
      |g AS (
      |  SELECT grp, COUNT(*) AS n, CAST(SUM(i * q) AS BIGINT) AS siv,
      |    CAST(SUM(q) AS BIGINT) AS sv
      |  FROM r GROUP BY 1)
      |SELECT grp, n,
      |  CAST(2 * siv - (n + 1) * sv AS DOUBLE)
      |    / CAST(n * sv AS DOUBLE) AS gini
      |FROM g""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("a_gini", aGini, Some(aGiniSql)),
    ("a_bootstrap_ci", aBootstrapCi, Some(aBootstrapCiSql)),
    // oracle-gated since r11: DuckHash spells the seed-chained
    // xxhash64(id, b) draw exactly in HUGEINT u64 arithmetic
    ("a_bootstrap_ci_fast", aBootstrapCiFast,
      Some(graft.ops.Bootstrap.meanCiSql(
        "SELECT *, l_orderkey * 10 + l_linenumber AS id FROM lineitem",
        "l_returnflag", "l_quantity", "id", b = 50,
        loPct = 0.05, hiPct = 0.95, integerValued = true, fastHash = true))),
    ("rec_association_rules", recAssociationRules,
      Some(recAssociationRulesSql)),
    ("pipeline_next_event_examples", pipelineNextEvent,
      Some(pipelineNextEventSql)),
    ("j_record_linkage", jRecordLinkage, Some(jRecordLinkageSql)),
    ("ml_isotonic_calibration", mlIsotonic, Some(mlIsotonicSql)),
    ("w_seasonal_anomaly", wSeasonalAnomaly, Some(wSeasonalAnomalySql)),
    ("a_corr_matrix", aCorrMatrix, Some(aCorrMatrixSql)),
    ("quality_expectations", qualityExpectations,
      Some(qualityExpectationsSql)),
    ("ml_pca", mlPca, None),
    ("ml_pca_planted_spectrum", mlPcaPlanted, Some(mlPcaPlantedSql)),
    ("ml_pca_project", mlPcaProject, Some(mlPcaProjectSql)),
    ("w_lttb_downsample", wLttbDownsample, Some(wLttbDownsampleSql)),
    ("ml_calibration", mlCalibration, Some(mlCalibrationSql)),
    ("ml_confusion_f1", mlConfusionF1, Some(mlConfusionF1Sql)),
    ("ml_cohens_kappa", mlCohensKappa, Some(mlCohensKappaSql)),
    ("ml_logreg_gd", mlLogregGd, Some(mlLogregGdSql)),
    ("ml_auc_roc", mlAucRoc, Some(mlAucRocSql)),
    ("ml_gains_table", mlGainsTable, Some(mlGainsTableSql)),
    ("a_cohort_retention", aCohortRetention, Some(aCohortRetentionSql)),
    ("o_skyline_pareto", oSkylinePareto, Some(oSkylineParetoSql)),
    ("rec_item_similarity", recItemSimilarity, Some(recItemSimilaritySql)),
    ("ml_ranking_metrics", mlRankingMetrics, Some(mlRankingMetricsSql)),
    ("text_chi2_terms", textChi2Terms, Some(textChi2TermsSql)),
    ("ml_naive_bayes", mlNaiveBayes, Some(mlNaiveBayesSql)),
    ("w_cusum_alerts", wCusumAlerts, Some(wCusumAlertsSql)),
    ("a_active_stickiness", aActiveStickiness, Some(aActiveStickinessSql)),
    ("w_quantile_normalize", wQuantileNormalize, Some(wQuantileNormalizeSql))
  )
}
