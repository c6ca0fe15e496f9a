package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.f1.{CleanSample, WarehouseBuild}

class WarehouseIngestSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def lapRows(year: Long, round: Long, driver: Long, lapNo: Long,
      n: Int, spacing: Double, speedBase: Double) =
    (0 until n).map(i => CleanSample(year, round, driver, lapNo,
      Time = i.toDouble, Speed = speedBase + i % 7,
      RPM = 10000, nGear = 5, Throttle = 90, Brake = i % 2,
      DRS = 1, Distance = i * spacing, Compound = "SOFT", TyreLife = 2))

  test("streaming warehouse build: per-round files → clean+resample → partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("whingest").toString
    val raw = s"$root/raw"; val wh = s"$root/wh"; val ckpt = s"$root/ckpt"

    // landing file 1 = round 1, landing file 2 = round 2 (file = the
    // complete-round ingest unit, like the reference's session dumps)
    (lapRows(2023, 1, 44, 1, 30, 100, 200) ++ lapRows(2023, 1, 1, 1, 25, 120, 210))
      .toDF().coalesce(1).write.mode("append").parquet(raw)
    (lapRows(2023, 2, 44, 8, 40, 80, 190)).toDF()
      .coalesce(1).write.mode("append").parquet(raw)

    val b1 = WarehouseIngest.ingestAvailableNow(spark, raw, wh, ckpt,
      maxFilesPerTrigger = 1)
    assert(b1 >= 2L) // one batch per landing file
    assert(new java.io.File(s"$wh/year=2023/round=1").isDirectory)
    assert(new java.io.File(s"$wh/year=2023/round=2").isDirectory)
    val round1 = WarehouseBuild.readWarehouse(spark, wh)
      .where(col("Round") === 1)
    val base = round1.collect().toSet

    // rerun with nothing new: ledger says done, warehouse untouched
    assert(WarehouseIngest.ingestAvailableNow(spark, raw, wh, ckpt) === 0L)

    // a CORRECTED round-2 file lands: only round 2 is rebuilt (the
    // reference's delete-then-insert rerun as a file drop)
    (lapRows(2023, 2, 44, 8, 40, 80, 290)).toDF()
      .coalesce(1).write.mode("append").parquet(raw)
    assert(WarehouseIngest.ingestAvailableNow(spark, raw, wh, ckpt) === 1L)
    val after = WarehouseBuild.readWarehouse(spark, wh)
    assert(after.where(col("Round") === 1).collect().toSet === base)
    val s2 = after.where(col("Round") === 2)
      .agg(min(col("Speed"))).collect()(0).getFloat(0)
    assert(s2 >= 290f - 1f) // round 2 now carries the corrected speeds
  }
}
