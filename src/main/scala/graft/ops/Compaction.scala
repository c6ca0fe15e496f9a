package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for hive-partitioned parquet trees.
  *
  * The reference's collector appends one parquet per session per round
  * (F1_Data_Collect.ipynb:122 delete-then-insert, then ad-hoc re-runs),
  * so a season's warehouse accretes many sub-HDFS-block files — the
  * classic small-files problem that at 100 TB turns every scan into
  * millions of open/seek/footer reads and floods the driver's listing.
  * `compact` rewrites a tree to a bounded file count per partition with
  * content unchanged (gated: the compacted tree hash-matches the DuckDB
  * oracle reading the SAME files — `s5_compaction` in
  * WarehouseGateQueries).
  *
  * Scale shape: ONE shuffle keyed on the partition columns (plus an
  * optional bounded salt so a skewed partition fans out over
  * `filesPerPartition` tasks instead of funnelling into one), an
  * optional within-task sort for run-length-friendly column layout, and
  * a `maxRecordsPerFile` cap as the hard upper bound. No driver-side
  * row movement; the only driver work is the final file commit.
  */
object Compaction {

  /** Rewrite `inRoot` (hive-partitioned by `partitionCols`) into
    * `outRoot` with ≤ `filesPerPartition` files per partition (plus the
    * `maxRecordsPerFile` safety cap) and rows sorted by `sortCols`
    * within each file. Content is preserved exactly. */
  def compact(
      spark: SparkSession,
      inRoot: String,
      outRoot: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 8L * 1024 * 1024): Unit = {
    require(partitionCols.nonEmpty, "compact needs partition columns")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val df = spark.read.parquet(inRoot)
    val parts = partitionCols.map(col)
    // Skew-safe fan-out: a deterministic bounded salt from the sort (or
    // all) columns spreads one hot partition over several tasks/files.
    val shuffled =
      if (filesPerPartition == 1) df.repartition(parts: _*)
      else {
        val saltSrc = (if (sortCols.nonEmpty) sortCols else df.columns.toSeq
          .filterNot(partitionCols.contains)).map(col)
        df.withColumn("_salt",
            pmod(hash(saltSrc: _*), lit(filesPerPartition)))
          .repartition(parts :+ col("_salt"): _*)
          .drop("_salt")
      }
    val laid =
      if (sortCols.nonEmpty)
        shuffled.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else shuffled
    laid.write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .mode("overwrite")
      .parquet(outRoot)
  }

  /** Per-partition file census of a hive tree — the audit that decides
    * WHEN to compact (file counts / bytes per leaf directory). Driver
    * work is directory listing only (bounded by partition count, the
    * same listing any scan planning does). */
  def audit(spark: SparkSession, root: String): DataFrame = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    val rootStr = rootPath.toUri.getPath
    val leaves = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val rel = f.getPath.getParent.toUri.getPath
          .stripPrefix(rootStr).stripPrefix("/")
        val (n, b) = leaves.getOrElse(rel, (0L, 0L))
        leaves.update(rel, (n + 1, b + f.getLen))
      }
    }
    import spark.implicits._
    leaves.toSeq.map { case (p, (n, b)) => (p, n, b) }
      .toDF("partition", "files", "bytes")
      .orderBy("partition")
  }
}
