package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence dump: write `PLANS.md` with the FORMATTED physical
  * plan of each headline query at sf0.001 — the inspectable record
  * behind the COVERAGE claims (pushdown reaches the scan, dims
  * broadcast, aggregates have partial/final split, windows share
  * exchanges). Regenerate with `sbt "runMain graft.PlanDump"` after
  * plan-affecting changes; PlanLintSpec is the enforcement net, this
  * file is the human-readable exhibit.
  */
object PlanDump {
  private val Headline = Seq(
    "s4_scan_project" -> "filter + projection pushdown into the parquet scan",
    "j4_dim_join" -> "dimension join broadcasts the small side",
    "a1_multi_agg" -> "multi-function aggregate: partial -> exchange -> final",
    "w3_running" -> "running total: one exchange feeds the window",
    "a_salted_agg" -> "two-phase salted aggregation (hot-key guard)",
    "j_range_binned" -> "interval join rewritten to a binned equi-join",
    "dedup_minhash_lsh" -> "LSH near-dup: band bucket join + verify, no corpus^2",
    "knn_ivfpq_topk" -> "IVFADC: cell routing, ADC scan over probed cells only",
    "resample_linear" -> "distance-grid resample (the reference's custom op)",
    "a_sessionize" -> "sessionization: both windows ride one shuffle",
    "p_feature_scale" -> "feature scaling: tiny stats broadcast back, no corpus window",
    "pipeline_block_diff" -> "block-checksum diff: compare runs on bucket summaries, never rows",
    "j_skew_salted" -> "salted skew join: (key, salt) sort-merge, dim replicated, no hot reducer",
    "o_global_rank" -> "global rank: range buckets + offsets, no single-partition window",
    "dedup_prefix_filter" -> "prefix-filtered similarity join: rarest-shingle candidates, lossless",
    "pipeline_e2e_build" -> "end-to-end corpus build: 3 gates + split + rollup in one plan",
    "o_zorder_cluster" -> "z-order: Morton bit-interleave stays inside one codegen stage",
    "s7_pruned_scan" -> "engine-written hive tree read back with partition filters",
    "knn_ivfpq_store" -> "disk IVFADC probe: cell partitions pruned before the ADC scan",
    "a_countmin_freq" -> "count-min probe: broadcast sketch + least(element_at), no driver assembly",
    "dedup_substring_hashed" -> "ExactSubstr dedup, scale path: rolling-hash grams shuffle 8-byte keys once",
    "dedup_substring_incremental" -> "incremental ExactSubstr: bloom routes batch grams, exact semi-join verifies",
    "s9_codec_roundtrip" -> "codec roundtrip: encode+decode fused in one narrow pass, 2-group agg",
    "w_lttb_downsample" -> "LTTB downsample: keyed windows over bucket summaries, join back, keyed pick",
    "ml_calibration" -> "calibration: long sufficient statistics, one hash aggregate",
    "s5_compaction" -> "small-file compaction readback: partition-discovered scan of the compacted tree",
    "j_feature_store" -> "point-in-time feature join: two chained asof unions, staleness NULLing",
    "quality_expectations" -> "expectation suite: whole rule list folds in ONE partial/final aggregate",
    "a_corr_matrix" -> "correlation matrix: every pair statistic in one aggregate, pairs exploded after",
    "knn_random_projection" -> "JL projection: k fused fold expressions, zero shuffle, scan-only plan",
    "w_seasonal_anomaly" -> "seasonal decompose: bucket collapse first, keyed windows on the bucket table",
    "j_record_linkage" -> "record linkage: band-blocked equi join, no nested loop, keyed best-match window",
    "s10_throttled_sink" -> "throttled sink gate: one driver-keyed shuffle into the stateful fold, rank shares it",
    "f1_e2e_serving" -> "E3 serving lifecycle: pruned scan -> scale -> windows -> inference -> union, one plan",
    "ml_pca_planted_spectrum" -> "planted-spectrum PCA: one covariance fold, fused projection, B-row model join",
    "pipeline_dsir_select" -> "DSIR selection: B-bounded distribution fold, broadcast log-ratios, top-k",
    "dedup_lines_c4" -> "C4 span dedup: one chunk explode, keeper hash-agg, join-back, per-doc rebuild",
    "knn_int8_topk" -> "SQ8 search: 1-row scale array broadcast into the encoder, query fan over the scan",
    "text_kneser_ney" -> "Kneser-Ney LM: three count aggregates, bounded tables LEFT-join the test stream",
    "pipeline_fineweb_funnel" -> "FineWeb funnel: gopher audit -> span dedup -> length floor, one plan, flag rollup",
    "pipeline_quality_classifier" -> "quality filter: GD weight row broadcast per iteration, scoring is a stateless map",
    "pipeline_wordpiece_encode" -> "WordPiece: greedy fold fully inside codegen, vocab is one broadcast array row",
    "a_kmv_overlap_matrix" -> "KMV overlap matrix: sketch-sized frames after one scan, in-row pair expansion witness",
    "eval_bleu4" -> "BLEU-4: one pair-pivot text shuffle, local gram-count kernel, narrow fixed-point-log map",
    "eval_chrf" -> "chrF: one pair-pivot text shuffle, all 6 codepoint-gram orders counted in the local kernel map",
    "eval_chrfpp" -> "chrF++: char (tag 0) + word (tag 1) families counted in one local kernel pass per pair",
    "eval_bleu4_multiref" -> "multi-ref BLEU: one cand_id join + ref collect, Papineni clip and brevity argmin in the kernel",
    "eval_rouge_l" -> "ROUGE-L: one pair shuffle into the typed LCS kernel, per-pair rows only",
    "eval_bleu4_corpus" -> "corpus BLEU: kernel pair counts, pair-window inclusion, 4-row rollup, one output row",
    "eval_token_f1" -> "token F1 + EM: whole-text marker rides the kernel gram array, one pair-pivot shuffle",
    "eval_wer" -> "WER: one pair shuffle into the typed Levenshtein kernel",
    "eval_distinct_n" -> "distinct-n: one scan, two map-side-combined shuffles over the gram currency")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb ++= "# Physical plan exhibits\n\n"
    sb ++= s"Generated by `graft.PlanDump` over `$sfDir` " +
      "(AQE on, 4 shuffle partitions). PlanLintSpec enforces the " +
      "invariants; this file shows them.\n"
    Headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n$why\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim
      sb ++= "\n```\n"
    }
    // hand-written exhibits (negative results, root-cause notes)
    // survive regeneration by living in PLANS_NOTES.md
    val notes = java.nio.file.Paths.get("PLANS_NOTES.md")
    if (java.nio.file.Files.exists(notes)) {
      val txt = new String(java.nio.file.Files.readAllBytes(notes), "UTF-8")
      sb ++= "\n" + txt.linesIterator.drop(1).mkString("\n").stripLeading + "\n"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote PLANS.md (${Headline.size} plans)")
    spark.stop()
  }
}
