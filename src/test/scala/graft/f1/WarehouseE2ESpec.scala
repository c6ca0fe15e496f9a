package graft.f1

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.3 minimum slice, end-to-end: raw fixtures → clean →
  * resample → partitioned warehouse write → partition-discovered read
  * → pruned query → analytics result.
  */
class WarehouseE2ESpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def rawFixture = {
    import spark.implicits._
    // three laps across two rounds; lap 7 of round 2 is too short
    def lap(year: Long, round: Long, driver: Long, lapNo: Long,
        n: Int, spacing: Double, baseTime: Double) =
      (0 until n).map(i => CleanSample(year, round, driver, lapNo,
        Time = baseTime + i, Speed = 200.0 + driver + i % 7,
        RPM = 10000, nGear = 5, Throttle = 90, Brake = i % 2,
        DRS = 1, Distance = i * spacing,
        Compound = "SOFT", TyreLife = 2))
    (lap(2023, 1, 44, 1, 30, 100, 0) ++ lap(2023, 1, 1, 1, 25, 120, 0) ++
      lap(2023, 2, 44, 7, 12, 100, 50) ++ lap(2023, 2, 44, 8, 40, 80, 100))
      .toDF()
  }

  test("build → partitioned write → pruned read → fastest-lap query") {
    val dir = java.nio.file.Files.createTempDirectory("wh").toString
    val points = WarehouseBuild.build(spark, rawFixture)
    WarehouseBuild.writeWarehouse(points, dir)

    // hive layout on disk
    val r1 = new java.io.File(s"$dir/year=2023/round=1")
    val r2 = new java.io.File(s"$dir/year=2023/round=2")
    assert(r1.isDirectory && r2.isDirectory)

    val back = WarehouseBuild.readWarehouse(spark, dir)
    // partition columns are pruning keys; in-file keys are authoritative
    val pruned = back.where(col("round") === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("round=1"),
      s"expected partition pruning in plan")
    // round 2: the 12-sample lap is gated out, only lap 8 survives
    assert(pruned.select(countDistinct(col("LapNumber"))).head.getLong(0) === 1L)

    val fastest = Analytics.fastestLapPerDriver(
      back.where(col("round") === 1)
        .groupBy("Driver", "LapNumber").agg(max("LapTime_Sec").as("LapTime_Sec"))
        .withColumnRenamed("Driver", "Driver"))
    val rows = fastest.collect()
    assert(rows.length === 2) // drivers 1 and 44 in round 1
  }

  test("dynamic partition overwrite replaces only the rewritten round") {
    val dir = java.nio.file.Files.createTempDirectory("wh3").toString
    val all = WarehouseBuild.build(spark, rawFixture)
    WarehouseBuild.writeWarehouse(all, dir)
    val before = WarehouseBuild.readWarehouse(spark, dir)
    // materialize BEFORE the overwrite replaces the underlying files
    val r1CountBefore = before.where(col("Round") === 1).count()
    val r2CountBefore = before.where(col("Round") === 2).count()
    // rebuild only round 2 (idempotent re-run of a failed round)
    import spark.implicits._
    val round2 = all.filter(col("Round") === 2).as[TelemetryPoint]
    WarehouseBuild.overwriteRounds(round2, dir)
    val after = WarehouseBuild.readWarehouse(spark, dir)
    assert(after.where(col("Round") === 1).count() === r1CountBefore) // untouched
    assert(after.where(col("Round") === 2).count() === r2CountBefore) // replaced identically
  }

  test("read-back schema preserves measured column types") {
    val dir = java.nio.file.Files.createTempDirectory("wh2").toString
    WarehouseBuild.writeWarehouse(WarehouseBuild.build(spark, rawFixture), dir)
    val back = WarehouseBuild.readWarehouse(spark, dir)
    val types = back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("Distance") === "float")
    assert(types("Speed") === "float")
    assert(types("Brake") === "double")
    assert(types("Year") === "bigint")
    assert(types("Round") === "bigint")
    assert(types("Compound") === "string")
    assert(back.schema.fieldNames.length === 14) // canonical measured schema
  }
}
