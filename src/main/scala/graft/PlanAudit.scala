package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * SURVEY "explain and iterate" loop. Run: sbt "runMain graft.PlanAudit [name...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s4_scan_project", "j4_dim_join", "a1_multi_agg", "w7_islands",
        "knn_cosine_topk", "asof_latest", "j_range_binned", "a_topk_agg",
        "a_heavy_hitters", "text_bm25", "w_range_frame",
        "dedup_fuzzy_levenshtein", "pipeline_incremental_dedup",
        "pipeline_contamination", "text_tfidf", "dedup_chunk",
        "stream_static_enrich", "a_hll_partial")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
