package graft.queries

import QueryDsl._
import graft.ml.TimeSeriesCv
import graft.sim.ScalarQuant
import graft.sources.TextFormats
import graft.text.{CcnetBuckets, DedupClusters, FinewebFunnel, GopherRules, KneserNey, LineDedup, WordPiece}

/** Round-8 extension gates: C4-style corpus-global span dedup, the
  * Kneser-Ney perplexity-filter LM, int8 scalar-quantized vector
  * search, JSONL/CSV foreign-engine interop, and purged time-series CV
  * folds. All oracle-exact (the int8 gate included — its arithmetic is
  * pure integer, so unlike the float knn gates there is no epsilon). */
object CorpusOpsQueries {

  private val chunkWords = 8
  private val sqQueries = 25
  private val sqK = 10

  private val dedupLinesC4: Q = (s, d) =>
    LineDedup.dedupChunks(table(s, d, "documents"), chunkWords)

  private val textKneserNey: Q = (s, d) =>
    KneserNey.bigramKn(table(s, d, "documents"))

  private val knnInt8: Q = (s, d) =>
    ScalarQuant.int8TopK(table(s, d, "embeddings"), sqQueries, sqK)

  private val mlTimeseriesCv: Q = (s, d) =>
    TimeSeriesCv.quarterlyFolds(table(s, d, "orders"))

  private val textGopherRules: Q = (s, d) =>
    GopherRules.audit(table(s, d, "documents"))

  // same threshold/DF-cap as the dedup_clusters gate (the scale path)
  private val ccThreshold = 0.5
  private val ccMaxDF = 12L

  private val pipelineCcnetBuckets: Q = (s, d) =>
    CcnetBuckets.buckets(table(s, d, "documents"))

  private val pipelineDedupCanonical: Q = (s, d) =>
    DedupClusters.canonicalRetention(table(s, d, "documents"),
      ccThreshold, ccMaxDF)

  /** Golden-record survivorship over the j_record_linkage fixture:
    * probes are the 1-in-7 perturbed-name customers carrying their own
    * acctbal (+10, the "fresher vendor feed" value the MAX rule should
    * surface) and segment; reference is the full customer table. */
  private val jGoldenRecord: Q = (s, d) => {
    import org.apache.spark.sql.functions._
    val cust = table(s, d, "customer")
    val probeFull = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_nationkey"),
        when(col("c_custkey") % 3 === 0,
          concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X")))
          .when(col("c_custkey") % 5 === 0, concat(lit("Z"), col("c_name")))
          .otherwise(col("c_name")).as("c_name"),
        (col("c_acctbal") + lit(10.0)).as("c_acctbal"),
        col("c_mktsegment"))
    val pairs = graft.ops.RecordLinkage.bestMatch(
      probeFull.select("c_custkey", "c_nationkey", "c_name"), cust,
      probeKey = "c_custkey", refKey = "c_custkey", nameCol = "c_name",
      blockCols = Seq("c_nationkey"), maxEdit = 2)
      .select(col("probe_key"), col("ref_key"))
    graft.ops.GoldenRecord.survivorship(cust, probeFull, pairs,
      refKey = "c_custkey", probeKey = "c_custkey", nameCol = "c_name",
      numAttr = "c_acctbal", catAttr = "c_mktsegment")
  }

  private val goldenProbeNameSql =
    """SELECT c_custkey, c_nationkey,
      |  CASE WHEN c_custkey % 3 = 0
      |         THEN substring(c_name, 1, length(c_name) - 1) || 'X'
      |       WHEN c_custkey % 5 = 0 THEN 'Z' || c_name
      |       ELSE c_name END AS c_name
      |FROM customer WHERE c_custkey % 7 = 0""".stripMargin

  private val jGoldenRecordSql = graft.ops.GoldenRecord.survivorshipSql(
    refSql = "SELECT * FROM customer",
    probeSql =
      s"""SELECT p.*, c.c_acctbal + 10.0 AS c_acctbal, c.c_mktsegment
         |FROM ($goldenProbeNameSql) p
         |JOIN customer c USING (c_custkey)""".stripMargin,
    pairsSql = graft.ops.RecordLinkage.bestMatchSql(
      probeSql = goldenProbeNameSql,
      refSql = "SELECT c_custkey, c_nationkey, c_name FROM customer",
      probeKey = "c_custkey", refKey = "c_custkey", nameCol = "c_name",
      blockCols = Seq("c_nationkey"), maxEdit = 2),
    refKey = "c_custkey", probeKey = "c_custkey", nameCol = "c_name",
    numAttr = "c_acctbal", catAttr = "c_mktsegment")

  /** Weighted median per group — the duplication-free form of "median
    * price weighted by quantity": lower weighted median = smallest v
    * whose cumulative weight reaches half the total (2·cumw ≥ W, all
    * integer). One keyed aggregate to (group, value) granularity, one
    * keyed window over that REDUCED frame (partitioned by group — no
    * global window), one min — never a corpus-wide sort or an
    * explode-by-weight. Exact: integer weights, no interpolation. */
  private val aWeightedMedian: Q = (s, d) => {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val li = table(s, d, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_extendedprice").as("v"),
        floor(col("l_quantity")).cast("long").as("w"))
    val byValue = li.groupBy(col("g"), col("v")).agg(sum(col("w")).as("vw"))
    val cum = byValue.withColumn("cumw",
      sum(col("vw")).over(Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("vw")).over(Window.partitionBy(col("g"))))
    cum.filter(col("cumw") * 2 >= col("total"))
      .groupBy(col("g")).agg(min(col("v")).as("weighted_median"),
        max(col("total")).as("w_total"))
      .select(col("g").as("l_returnflag"), col("weighted_median"),
        col("w_total"))
  }

  private val aWeightedMedianSql =
    """WITH byv AS (
      |  SELECT l_returnflag AS g, l_extendedprice AS v,
      |    CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS vw
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT g, v, vw,
      |    SUM(vw) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(vw) OVER (PARTITION BY g) AS total
      |  FROM byv)
      |SELECT g AS l_returnflag, MIN(v) AS weighted_median,
      |  CAST(MAX(total) AS BIGINT) AS w_total
      |FROM cum WHERE cumw * 2 >= total
      |GROUP BY 1""".stripMargin

  /** Per-doc unigram KL divergence vs the corpus distribution — the
    * "how unlike the corpus is this document" novelty/quality signal
    * (outlier docs score high, boilerplate scores near 0). Terms are
    * 6-dp-rounded and decimal-summed (the text_lm_score cross-engine
    * contract); p_corpus > 0 always since the corpus includes the
    * doc, so no smoothing is needed and the score is total. */
  private val textKlDivergence: Q = (s, d) => {
    import org.apache.spark.sql.functions._
    val words = table(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    // the (doc, w, c) posting list is the lean shared frame: doc
    // totals, corpus counts (Σc per w ≡ count over words), the corpus
    // total, and the scoring join all derive from it — pinned so the
    // explode runs once (scan census: 4 → 1 corpus scans)
    val docCounts = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val docTotals = docCounts.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val corpusCounts = docCounts.groupBy(col("w")).agg(sum(col("c")).as("cc"))
    val corpusTotal = corpusCounts.agg(sum(col("cc")).cast("double").as("nn"))
    docCounts.join(docTotals, "doc_id").join(corpusCounts, "w")
      .crossJoin(broadcast(corpusTotal))
      .withColumn("term", round(
        (col("c").cast("double") / col("n").cast("double")) *
          log((col("c").cast("double") / col("n").cast("double")) /
            (col("cc").cast("double") / col("nn"))), 6))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_words"),
        sum(col("term").cast("decimal(38,6)")).cast("double").as("kl"))
  }

  private val textKlDivergenceSql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      |       FROM words GROUP BY 1, 2),
      |dt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM dc GROUP BY 1),
      |cc AS (SELECT w, CAST(count(*) AS BIGINT) AS cc FROM words GROUP BY 1),
      |ct AS (SELECT CAST(SUM(cc) AS DOUBLE) AS nn FROM cc),
      |terms AS (
      |  SELECT dc.doc_id, dt.n,
      |    round((CAST(dc.c AS DOUBLE) / CAST(dt.n AS DOUBLE)) *
      |      ln((CAST(dc.c AS DOUBLE) / CAST(dt.n AS DOUBLE)) /
      |         (CAST(cc.cc AS DOUBLE) / ct.nn)), 6) AS term
      |  FROM dc JOIN dt USING (doc_id) JOIN cc USING (w) CROSS JOIN ct)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_words,
      |  CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS kl
      |FROM terms GROUP BY 1""".stripMargin

  /** Largest-remainder (Hamilton) apportionment of an integer token
    * budget across languages — the exact-quota step of a mixture
    * build: floor shares from pure integer division, the leftover
    * distributed to the largest fractional remainders (ties by lang),
    * so Σ quota = budget EXACTLY (spec-pinned; proportional rounding
    * can't promise that). All arithmetic is integer → oracle-exact.
    * Everything after the one corpus aggregate runs on the
    * language-bounded frame (window rides the GlobalRank pmod
    * constant-partition trick — no WARN, and the frame is
    * dimension-sized by construction). */
  private val budgetTokens = 100000L
  private val pipelineApportionBudget: Q = (s, d) => {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // lang-bounded; the total, quota frame (itself read twice), and
    // leftover all derive — pinned so the corpus word-count pass runs
    // once (scan census: 4 → 1 source scans)
    val w = table(s, d, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("words"))
      .localCheckpoint(true)
    val tot = w.agg(sum(col("words")).as("w_total"))
    val q = w.crossJoin(broadcast(tot))
      .withColumn("floor_quota",
        expr(s"$budgetTokens * words div w_total"))
      .withColumn("rem", expr(s"($budgetTokens * words) % w_total"))
    val leftover = q.agg(
      (lit(budgetTokens) - sum(col("floor_quota"))).as("leftover"))
    q.crossJoin(broadcast(leftover))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(pmod(col("floor_quota"), lit(1)))
          .orderBy(col("rem").desc, col("lang"))))
      .select(col("lang"), col("words"), col("floor_quota"),
        col("rem"),
        (col("rnk") <= col("leftover")).as("extra"),
        (col("floor_quota") +
          when(col("rnk") <= col("leftover"), 1L).otherwise(0L)).as("quota"))
  }

  private val pipelineApportionBudgetSql =
    s"""WITH w AS (
       |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS words
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(words) AS BIGINT) AS w_total FROM w),
       |q AS (
       |  SELECT lang, words,
       |    $budgetTokens * words // w_total AS floor_quota,
       |    ($budgetTokens * words) % w_total AS rem
       |  FROM w CROSS JOIN tot),
       |lo AS (SELECT $budgetTokens - CAST(SUM(floor_quota) AS BIGINT)
       |         AS leftover FROM q),
       |r AS (
       |  SELECT q.*, lo.leftover,
       |    row_number() OVER (ORDER BY rem DESC, lang) AS rnk
       |  FROM q CROSS JOIN lo)
       |SELECT lang, words, CAST(floor_quota AS BIGINT) AS floor_quota,
       |  CAST(rem AS BIGINT) AS rem, (rnk <= leftover) AS extra,
       |  CAST(floor_quota + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
       |       AS BIGINT) AS quota
       |FROM r""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("dedup_lines_c4", dedupLinesC4, Some(LineDedup.dedupChunksSql(chunkWords))),
    ("text_kneser_ney", textKneserNey, Some(KneserNey.bigramKnSql())),
    ("knn_int8_topk", knnInt8, Some(ScalarQuant.int8TopKSql(sqQueries, sqK))),
    ("source_jsonl_interop", TextFormats.jsonlInterop _,
      Some(TextFormats.jsonlInteropSql)),
    ("source_csv_interop", TextFormats.csvInterop _,
      Some(TextFormats.csvInteropSql)),
    ("ml_timeseries_cv", mlTimeseriesCv, Some(TimeSeriesCv.quarterlyFoldsSql())),
    ("text_gopher_rules", textGopherRules, Some(GopherRules.auditSql)),
    ("source_orc_roundtrip", TextFormats.orcRoundtrip _,
      Some(TextFormats.orcRoundtripSql)),
    ("pipeline_ccnet_buckets", pipelineCcnetBuckets,
      Some(CcnetBuckets.bucketsSql())),
    ("pipeline_dedup_canonical", pipelineDedupCanonical,
      Some(DedupClusters.canonicalRetentionSql(ccThreshold, ccMaxDF))),
    ("pipeline_fineweb_funnel",
      ((s, d) => FinewebFunnel.funnel(table(s, d, "documents"))): Q,
      Some(FinewebFunnel.funnelSql())),
    ("pipeline_wordpiece_encode",
      ((s, d) => WordPiece.encode(table(s, d, "documents"))): Q,
      Some(WordPiece.encodeSql())),
    ("pipeline_tokenizer_fertility",
      ((s, d) => WordPiece.fertility(table(s, d, "documents"))): Q,
      Some(WordPiece.fertilitySql())),
    ("pipeline_quality_classifier",
      ((s, d) => graft.ml.QualityClassifier.classify(table(s, d, "documents"))): Q,
      Some(graft.ml.QualityClassifier.classifySql())),
    ("j_golden_record", jGoldenRecord, Some(jGoldenRecordSql)),
    ("pipeline_wordpiece_roundtrip",
      ((s, d) => WordPiece.roundtrip(table(s, d, "documents"))): Q,
      Some(WordPiece.roundtripSql)),
    ("a_weighted_median", aWeightedMedian, Some(aWeightedMedianSql)),
    ("text_kl_divergence", textKlDivergence, Some(textKlDivergenceSql)),
    ("pipeline_apportion_budget", pipelineApportionBudget,
      Some(pipelineApportionBudgetSql)),
    ("ml_quantile_regression",
      ((s, d) => graft.ml.QuantileReg.train(
        table(s, d, "lineitem").select(
          org.apache.spark.sql.functions.col("l_quantity")
            .as("y"),
          org.apache.spark.sql.functions.lit(1L).as("x0"),
          org.apache.spark.sql.functions.expr("l_orderkey % 5").as("x1"),
          org.apache.spark.sql.functions.col("l_linenumber").cast("long")
            .as("x2"),
          org.apache.spark.sql.functions.expr("l_suppkey % 7").as("x3")),
        iters = 8, etaQ = 20000000L)): Q,
      Some(graft.ml.QuantileReg.trainSql(
        """SELECT l_quantity AS y, CAST(1 AS BIGINT) AS x0,
          |  l_orderkey % 5 AS x1, CAST(l_linenumber AS BIGINT) AS x2,
          |  l_suppkey % 7 AS x3
          |FROM lineitem""".stripMargin, iters = 8, etaQ = 20000000L))),
    ("graph_label_propagation",
      ((s, d) => graft.ops.LabelPropagation.itemCommunities(
        table(s, d, "lineitem"))): Q,
      Some(graft.ops.LabelPropagation.itemCommunitiesSql(
        "SELECT * FROM lineitem"))))
}
