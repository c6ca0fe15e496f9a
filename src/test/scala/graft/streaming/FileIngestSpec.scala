package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FileIngestSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("AvailableNow ingest is exactly-once per file across reruns and restarts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def wave(ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc $i")).toDF("id", "body")
        .coalesce(1).write.mode("append").parquet(src)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, body STRING")
    val clean: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.withColumn("n_tokens", size(split(col("body"), " ")))

    wave(1 to 50)
    wave(51 to 80) // second file in the backlog
    val b1 = FileIngest.ingestAvailableNow(spark, src, schema, clean,
      out, ckpt, maxFilesPerTrigger = 1)
    // bounded catch-up: two backlog files, one file per trigger
    assert(b1 >= 2L)
    assert(spark.read.parquet(out).count() === 80L)

    // rerun with nothing new: the checkpoint's file log says done
    val b2 = FileIngest.ingestAvailableNow(spark, src, schema, clean,
      out, ckpt, maxFilesPerTrigger = 1)
    assert(b2 === 0L)
    assert(spark.read.parquet(out).count() === 80L)

    // a new file lands; only IT is ingested (no re-read of old files)
    wave(81 to 100)
    val b3 = FileIngest.ingestAvailableNow(spark, src, schema, clean,
      out, ckpt, maxFilesPerTrigger = 1)
    assert(b3 === 1L)
    val all = spark.read.parquet(out)
    assert(all.count() === 100L)
    // no duplicates anywhere, transform applied to every row
    assert(all.select("id").distinct().count() === 100L)
    assert(all.filter(col("n_tokens") =!= 2).count() === 0L)
  }

  // Regression net (ADVICE r6 defect 5): a recentProgress-based batch
  // count is a ring buffer capped at 100 entries, so a long backfill
  // at file-per-trigger granularity under-reported. The commit-log
  // delta must report EVERY committed trigger past that cap.
  test("a >100-trigger backfill reports the exact committed batch count") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest_big").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val nFiles = 110
    // parallelize with nFiles slices → exactly one file per slice
    // (repartition would let AQE coalesce below nFiles)
    spark.sparkContext
      .parallelize((1 to nFiles).map(i => (i.toLong, s"doc $i")), nFiles)
      .toDF("id", "body").write.parquet(src)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, body STRING")
    val batches = FileIngest.ingestAvailableNow(spark, src, schema,
      identity, out, ckpt, maxFilesPerTrigger = 1)
    assert(batches === nFiles.toLong,
      s"commit-log count must survive the 100-entry progress cap (got $batches)")
    assert(spark.read.parquet(out).count() === nFiles.toLong)
  }
}
