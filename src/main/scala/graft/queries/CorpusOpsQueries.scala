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
    ("pipeline_quality_classifier",
      ((s, d) => graft.ml.QualityClassifier.classify(table(s, d, "documents"))): Q,
      Some(graft.ml.QualityClassifier.classifySql())),
    ("j_golden_record", jGoldenRecord, Some(jGoldenRecordSql)),
    ("pipeline_wordpiece_roundtrip",
      ((s, d) => WordPiece.roundtrip(table(s, d, "documents"))): Q,
      Some(WordPiece.roundtripSql)))
}
