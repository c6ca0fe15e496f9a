package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.Expectations
import graft.sources.Expectations.Rule

/** Validated streaming ingest with a dead-letter quarantine — the
  * production front door of a training-data lake: every micro-batch is
  * split by the declared row-level expectations; conforming rows land
  * in the published tree, violations land in a quarantine tree with
  * the batch id attached for triage, and neither side ever blocks the
  * other (bad data parks, good data flows — the opposite of the
  * fail-the-whole-job default).
  *
  * Exactly-once without a transactional table format: each batch
  * writes to `batch=<id>/` subdirectories in OVERWRITE mode, so a
  * crash-replayed batch rewrites its own directories byte-for-byte
  * instead of appending duplicates — the same dynamic-partition
  * idempotence trick as the warehouse sink (WarehouseBuild
  * overwriteRounds), with the batch id as the partition.
  *
  * Scale shape: the predicate is one codegen'd conjunction (no UDFs),
  * the split is two filters over one cached batch, and the quarantine
  * carries a `_violation` tag naming the FIRST failed rule (CASE
  * cascade in declared order) so triage can group by cause without
  * re-running the suite.
  */
object ValidatedIngest {

  /** Route one batch idempotently; exposed for direct testing and for
    * replay reasoning. */
  def writeBatch(batch: DataFrame, rules: Seq[Rule], goodDir: String,
      quarantineDir: String, batchId: Long): (Long, Long) = {
    val rowRules = rules.filterNot(_.isInstanceOf[Expectations.Unique])
    val tagged = batch.withColumn("_ok", Expectations.rowPredicate(rules))
      .cache()
    try {
      val good = tagged.filter(col("_ok")).drop("_ok")
      val bad = tagged.filter(!col("_ok")).drop("_ok")
        .withColumn("_violation",
          rowRules.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
            (r, acc) => when(!Expectations.rowPredicate(Seq(r)), r.name)
              .otherwise(acc)
          })
      val nGood = good.count()
      val nBad = bad.count()
      // empty sides still write a directory marker so replay is
      // self-describing (an absent dir means "batch never ran")
      good.write.mode("overwrite").parquet(s"$goodDir/batch=$batchId")
      bad.write.mode("overwrite").parquet(s"$quarantineDir/batch=$batchId")
      (nGood, nBad)
    } finally tagged.unpersist()
  }

  /** Start the validated ingest over a streaming frame. */
  def start(stream: DataFrame, rules: Seq[Rule], goodDir: String,
      quarantineDir: String, checkpointDir: String): StreamingQuery = {
    val sink: (DataFrame, Long) => Unit = (batch, id) => {
      writeBatch(batch, rules, goodDir, quarantineDir, id); ()
    }
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink)
      .start()
  }

  /** Read back the published (validated) tree. */
  def readPublished(spark: SparkSession, goodDir: String): DataFrame =
    spark.read.option("basePath", goodDir).parquet(goodDir)
}
