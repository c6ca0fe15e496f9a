package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.f1.WarehouseBuild

/** Bronze→silver warehouse maintenance as ONE streaming job — the
  * reference's collect-then-preprocess loop (run a notebook per race
  * weekend: F1_Data_Collect.ipynb → F1_Data_PreProcessing.ipynb)
  * automated: tail the raw-telemetry landing zone, push each
  * micro-batch through the SAME clean → distance-resample operators
  * the batch build uses (WarehouseBuild.build), and dynamic-partition-
  * overwrite exactly the (year, round) partitions the batch touched
  * (the reference's delete-then-insert, F1_Data_Collect.ipynb:122).
  *
  * Contract: a landing FILE carries complete rounds (the unit the
  * reference ingests — one session dump per (year, round)); partition
  * overwrite then replaces whole rounds atomically. Re-dropping a
  * corrected round file re-runs just that round — the manual "re-run
  * the failed race" loop, now a file copy. Replays are idempotent:
  * the resample is deterministic, so rewriting a partition with the
  * same input yields byte-identical rows.
  *
  * At 100 TB: the checkpoint's file log is the ingest ledger (no
  * hand-rolled which-files bookkeeping), each trigger's work is
  * bounded by maxFilesPerTrigger, and the write touches only the
  * partitions present in the batch — the whole pipeline is
  * incremental in both input and output. */
object WarehouseIngest {

  /** Raw landing-zone schema (the bronze shape clean() expects). */
  val rawSchema: StructType = StructType.fromDDL(
    "Year BIGINT, Round BIGINT, Driver BIGINT, LapNumber BIGINT, " +
      "Time DOUBLE, Speed DOUBLE, RPM DOUBLE, nGear DOUBLE, " +
      "Throttle DOUBLE, Brake DOUBLE, DRS DOUBLE, Distance DOUBLE, " +
      "Compound STRING, TyreLife DOUBLE")

  /** Catch up on unprocessed landing files, rebuild the touched
    * rounds, stop. Returns the number of committed micro-batches
    * (0 = nothing new). */
  def ingestAvailableNow(spark: SparkSession, rawDir: String,
      warehouseRoot: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 10): Long = {
    val src = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(rawDir)
    val rebuild: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) => {
      val pts = WarehouseBuild.build(batch.sparkSession, batch)
      WarehouseBuild.overwriteRounds(pts, warehouseRoot)
    }
    val before = lastCommitted(checkpointDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(rebuild)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    lastCommitted(checkpointDir) - before
  }

  private def lastCommitted(checkpointDir: String): Long = {
    val d = new java.io.File(s"$checkpointDir/commits")
    Option(d.listFiles()).toSeq.flatten.map(_.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .sorted.lastOption.getOrElse(-1L)
  }
}
