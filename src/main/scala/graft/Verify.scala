package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Interop gates that write per-corpus artifacts embed
    * [[graft.util.Tables.SfTagToken]] in their (static) oracle SQL;
    * resolve it to the given run's corpus tag so the dumped SQL reads
    * the artifact tree that run just wrote. */
  def resolveOracleSql(sql: String, sfDir: String): String =
    sql.replace(graft.util.Tables.SfTagToken,
      graft.util.Tables.corpusTag(sfDir))

  /** Recall floors for rows-only ANN gates, vs the brute-force
    * witness — the single source the dump emission and the seam ledger
    * (tools/seam_ledger.json, SeamLedgerSpec) both check against.
    * EMPTY since r12: the last three rows-only ANN gates (knn_pca_pq,
    * knn_ivfpq_topk, knn_ivfpq_store) are now oracle-gated via the
    * composed artifact replays (Pq.pcaPqTopKSql / Pq.ivfPqTopKSql), so
    * no gate rides a recall anchor any more; the list stays as the
    * wiring for any future approximate gate (a below-floor recall now
    * writes an explicit failed flag into ann_recall.json — it cannot
    * pass silently). */
  val annRecallFloors: Seq[(String, Double)] = Seq.empty

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 restricts the dump
    // to those queries. Unset (the driver's invocation) = run all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // ANN recall anchors for any rows-only kNN gate (none since r12 —
    // the list is the wiring for future approximate gates): recall@k
    // vs the knn_cosine_topk dump IN THIS RUN, emitted into the dump
    // so the driver's correctness artifact carries the anchor value.
    // A below-floor recall is MACHINE-VISIBLE, not just stderr: the
    // gate's JSON entry carries "failed": true and the file carries a
    // top-level "any_failed": true (r11 ADVICE — warn-only meant the
    // driver could miss a recall regression at the verified scale).
    if (new java.io.File(s"$outDir/knn_cosine_topk").exists()) {
      def pairs(name: String): Set[(Long, Long)] =
        spark.read.parquet(s"$outDir/$name")
          .selectExpr("cast(query_id as long)", "cast(neighbor_id as long)")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs("knn_cosine_topk")
      val rows = annRecallFloors.flatMap { case (g, floor) =>
        if (!new java.io.File(s"$outDir/$g").exists() || exact.isEmpty) None
        else {
          val recall = (pairs(g) & exact).size.toDouble / exact.size
          val failed = recall < floor
          if (failed)
            System.err.println(f"[verify] $g recall@k $recall%.3f BELOW floor $floor")
          Some((s""""$g": {"recall_at_k": $recall, "floor": $floor, """ +
            s""""k": 5, "vs": "knn_cosine_topk", "failed": $failed}""", failed))
        }
      }
      if (rows.nonEmpty)
        Files.writeString(Paths.get(s"$outDir/ann_recall.json"),
          (rows.map(_._1) :+ s""""any_failed": ${rows.exists(_._2)}""")
            .mkString("{", ", ", "}"))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(resolveOracleSql(v, sfDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
