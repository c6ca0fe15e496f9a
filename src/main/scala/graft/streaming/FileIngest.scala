package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental file-based ingest — the pattern a 100 TB backfill or a
  * landing-zone tailer actually runs: `readStream` over a growing
  * parquet directory, `Trigger.AvailableNow` so each invocation
  * catches up on exactly the files the CHECKPOINT has not recorded and
  * then stops, `maxFilesPerTrigger` so catch-up happens in bounded
  * micro-batches instead of one giant batch that OOMs on a month of
  * backlog. Exactly-once at the FILE level is the source's contract:
  * the checkpoint's file log is the source of truth, so re-running
  * after success ingests nothing and re-running after a crash resumes
  * from the last committed batch — no manual "which files did we load"
  * bookkeeping, which is the failure-prone part of every hand-rolled
  * loader.
  *
  * The transform runs per micro-batch as a normal lazy plan (project /
  * filter / enrich — anything stateless); stateful needs go through
  * the StreamOps/TwsOps operators downstream of this source.
  */
object FileIngest {

  /** Highest batch id in the checkpoint's commit log (-1 = none).
    * Counting committed batches from the log, not `recentProgress`,
    * keeps the count exact: recentProgress is a ring buffer capped at
    * `spark.sql.streaming.numRecentProgressUpdates` (default 100), so
    * a big backfill at file-per-trigger granularity under-reports. */
  private def lastCommitted(checkpointDir: String): Long = {
    val d = new java.io.File(s"$checkpointDir/commits")
    Option(d.listFiles()).toSeq.flatten.map(_.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .sorted.lastOption.getOrElse(-1L)
  }

  /** Catch up on unprocessed files under `srcDir`, apply `transform`,
    * append to `outDir` parquet. Blocks until caught up (AvailableNow),
    * then returns the exact number of micro-batches this invocation
    * COMMITTED (delta of the checkpoint commit log) — 0 when the
    * checkpoint says there is nothing new. */
  def ingestAvailableNow(spark: SparkSession, srcDir: String,
      schema: StructType, transform: DataFrame => DataFrame,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1000): Long = {
    val before = lastCommitted(checkpointDir)
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val q = transform(src).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    lastCommitted(checkpointDir) - before
  }
}
