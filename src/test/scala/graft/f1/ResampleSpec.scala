package graft.f1

import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite {

  private def sample(dist: Double, time: Double, speed: Double = 100.0,
      compound: String = "SOFT", tyre: Double = 3.0): CleanSample =
    CleanSample(Year = 2022, Round = 18, Driver = 1, LapNumber = 5,
      Time = time, Speed = speed, RPM = 10000, nGear = 4, Throttle = 80,
      Brake = 0, DRS = 1, Distance = dist, Compound = compound, TyreLife = tyre)

  /** 11 valid samples 0..2500 m, 250 m apart. */
  private def validLap: Seq[CleanSample] =
    (0 to 10).map(i => sample(i * 250.0, 10.0 + i, speed = 100.0 + i * 10))

  private def run(ss: Seq[CleanSample]) =
    WarehouseBuild.resampleLap(2022, 18, 1, 5, ss.iterator).toArray

  test("gate: fewer than 10 samples → empty") {
    assert(run(validLap.take(9)).isEmpty)
  }

  test("gate: max distance < 2000 m → empty") {
    val short = (0 to 10).map(i => sample(i * 150.0, 10.0 + i)) // max 1500
    assert(run(short).isEmpty)
  }

  test("grid: arange(0, maxDist, 10) — excludes maxDist, includes 0") {
    val out = run(validLap) // maxDist 2500 → 250 points 0..2490
    assert(out.length === 250)
    assert(out.head.Distance === 0.0f)
    assert(out.last.Distance === 2490.0f)
  }

  test("grid when maxDist is not a multiple of step") {
    val lap = validLap :+ sample(2507.0, 21.5)
    val out = run(lap) // ceil(2507/10) = 251 points, 0..2500
    assert(out.length === 251)
    assert(out.last.Distance === 2500.0f)
  }

  test("linear channel values on the grid") {
    val out = run(validLap)
    // Speed is affine in distance: 100 + dist/25
    for (p <- out.take(50)) {
      assert(math.abs(p.Speed - (100.0 + p.Distance / 25.0)) < 1e-3,
        s"at ${p.Distance}")
    }
  }

  test("lap constants: compound/tyre from first sample in time order, lap time = max-min") {
    val lap = validLap.map(s =>
      if (s.Time == 10.0) s.copy(Compound = "MEDIUM", TyreLife = 7.0) else s)
    val out = run(lap)
    assert(out.forall(_.Compound == "MEDIUM"))
    assert(out.forall(_.TyreLife == 7.0))
    assert(out.forall(_.LapTime_Sec == 10.0)) // times 10..20
  }

  test("duplicate distances: keep first in time order") {
    // a duplicate of distance 250 arriving later with a wild speed value
    val lap = validLap :+ sample(250.0, 99.0, speed = 0.0)
    val out = run(lap)
    // the dup row is dropped BEFORE LapTime (reference reassigns `group`
    // to the deduped frame first) → LapTime stays 20-10=10, and the
    // speed at 250 m is the original 110, not the dup's 0
    assert(out.forall(_.LapTime_Sec == 10.0))
    val at250 = out.find(_.Distance == 250.0f).get
    assert(math.abs(at250.Speed - 110.0) < 1e-3)
  }

  test("out-of-order samples are time-sorted before dedup") {
    val lap = validLap.reverse
    val out = run(lap)
    assert(out.length === 250)
    val at0 = out.find(_.Distance == 0.0f).get
    assert(math.abs(at0.Speed - 100.0) < 1e-3)
  }

  test("extrapolation below first sample uses edge slope") {
    // samples start at 100 m: grid points 0..90 are extrapolated
    val lap = (0 to 10).map(i => sample(100.0 + i * 250.0, 10.0 + i, speed = 100.0 + i * 10))
    val out = run(lap)
    val at0 = out.find(_.Distance == 0.0f).get
    // slope = 10/250 = 0.04 → at 0: 100 - 0.04*100 = 96
    assert(math.abs(at0.Speed - 96.0) < 1e-3)
    // nearest channels clamp to the first value
    assert(at0.Brake === 0.0)
    assert(at0.nGear === 4.0)
  }

  test("end-to-end typed pipeline over a small fixture DataFrame") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val good = validLap
    val tooShort = (0 to 10).map(i =>
      sample(i * 150.0, 30.0 + i).copy(LapNumber = 6))
    val fixture = (good ++ tooShort).toDF()
    val out = WarehouseBuild.build(spark, fixture)
    val collected = out.collect()
    assert(collected.nonEmpty)
    assert(collected.forall(_.LapNumber == 5)) // lap 6 gated out
    assert(collected.length === 250)
  }

  test("cleanup: null handling and casts") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val raw = Seq(
      (2022L, 18L, Some(1L), Some(10.0), Some(100.0), Some(3.0), Some(1.0), Some(50.0), "SOFT"),
      (2022L, 18L, Some(1L), Some(11.0), None, Some(3.0), Some(1.0), Some(60.0), "SOFT"), // null Speed → dropped
      (2022L, 18L, None, Some(12.0), Some(105.0), Some(3.0), Some(1.0), Some(70.0), "SOFT") // null LapNumber → dropped
    ).toDF("Year", "Round", "LapNumber", "Time", "Speed", "nGear", "Brake", "Distance", "Compound")
      .withColumn("Driver", org.apache.spark.sql.functions.lit(44L))
      .withColumn("RPM", org.apache.spark.sql.functions.lit(null).cast("double"))
      .withColumn("Throttle", org.apache.spark.sql.functions.lit(90.0))
      .withColumn("DRS", org.apache.spark.sql.functions.lit(null).cast("double"))
      .withColumn("TyreLife", org.apache.spark.sql.functions.lit(null).cast("double"))
    val cleaned = WarehouseBuild.clean(raw)
    val rows = cleaned.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Double]("RPM") === 0.0)
    assert(r.getAs[Double]("DRS") === 0.0)
    assert(r.getAs[Double]("TyreLife") === 0.0)
    assert(r.getAs[Double]("Brake") === 1.0)
  }
}
