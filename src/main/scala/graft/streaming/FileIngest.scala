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

  /** Catch up on unprocessed files under `srcDir`, apply `transform`,
    * append to `outDir` parquet. Blocks until caught up (AvailableNow),
    * then returns the number of micro-batches this invocation ran —
    * 0 when the checkpoint says there is nothing new. */
  def ingestAvailableNow(spark: SparkSession, srcDir: String,
      schema: StructType, transform: DataFrame => DataFrame,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1000): Long = {
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
    q.recentProgress.count(_.numInputRows > 0).toLong
  }
}
