package graft.f1

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analytics library over the shipped reference partition (2022/R18:
  * 276,209 rows, 20 drivers, 481 laps — BASELINE.md measured values). */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private lazy val wh = spark.read
    .parquet("/root/reference/f1_processed_warehouse/year=2022/round=18/telemetry.parquet")
    .cache()
  private lazy val laps = LapAggregate.lapRollup(wh).cache()

  test("era report: one year with measured totals") {
    val rows = Analytics.eraReport(wh).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("Year") === 2022L)
    assert(rows.head.getAs[Long]("Data_Points") === 276209L)
    assert(rows.head.getAs[Float]("Max_Speed") <= 312.0f)
  }

  test("tyre report: only requested compounds, sensible speeds") {
    // 2022/R18 was a wet race: only INTERMEDIATE/WET compounds exist
    val rows = Analytics.tyreReport(wh, Seq("INTERMEDIATE", "WET")).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("INTERMEDIATE", "WET")))
    rows.foreach(r => assert(r.getAs[Double]("Avg_Speed") > 100.0))
    // dry-compound report on a wet race is legitimately empty
    assert(Analytics.tyreReport(wh).count() === 0L)
  }

  test("data audit: flags missing rounds and rolls up the season") {
    import spark.implicits._
    val meta = Seq(
      (2022L, 18L, "Singapore GP", "Marina Bay"),
      (2022L, 99L, "Phantom GP", "Nowhere")) // round with no telemetry
      .toDF("year", "round", "event_name", "circuit")
    val (detail, season) = Analytics.dataAudit(meta, wh)
    val d = detail.collect()
    assert(d.length === 2)
    val phantom = d.find(_.getAs[Long]("Round") == 99L).get
    assert(phantom.getAs[String]("status") === "MISSING")
    assert(phantom.getAs[Long]("Telemetry_Count") === 0L)
    val real = d.find(_.getAs[Long]("Round") == 18L).get
    assert(real.getAs[String]("status") === "OK")
    assert(real.getAs[Long]("Driver_Count") === 20L)
    val s = season.collect()
    assert(s.length === 1 && s.head.getAs[Long]("Event") === 2L)
  }

  test("fastest lap per driver + teacher/student extremes") {
    val fastest = Analytics.fastestLapPerDriver(laps)
    assert(fastest.count() === 20L)
    val ts = Analytics.teacherStudent(laps).head
    val byDriver = fastest.collect()
      .map(r => r.getAs[Long]("Driver") -> r.getAs[Double]("Best_LapTime")).toMap
    assert(byDriver(ts.getAs[Long]("teacher")) === byDriver.values.min)
    assert(byDriver(ts.getAs[Long]("student")) === byDriver.values.max)
  }

  test("pace features: ratio >= 1, lags drop first laps") {
    // run on the full lap rollup: the 107%-filtered table of this wet
    // race keeps a single lap, which the lag-drop legitimately empties
    val pf = Analytics.paceFeatures(laps).cache()
    assert(pf.count() > 0)
    assert(pf.filter(col("Pace_Ratio") < 1.0).count() === 0L)
    // every driver group lost exactly its first lap to the lag drop
    val drivers = laps.select("Driver").distinct().count()
    assert(pf.count() === laps.count() - drivers)
    // Session_Fastest is constant per (Year, Round)
    assert(pf.select(countDistinct(col("Session_Fastest"))).head.getLong(0) === 1L)
  }

  test("pace gap: cumulative gap is the running sum of per-lap gaps") {
    val drivers = laps.select("Driver").distinct().orderBy("Driver")
      .collect().map(_.getLong(0))
    val gap = Analytics.paceGap(laps, drivers(0), drivers(1)).collect()
    assert(gap.nonEmpty)
    var cum = 0.0
    gap.foreach { r =>
      cum += r.getAs[Double]("gap")
      assert(math.abs(r.getAs[Double]("cum_gap") - cum) < 1e-9)
    }
  }

  test("align laps on the shared grid: join keys are exact grid points") {
    val ts = Analytics.teacherStudent(laps).head
    val teacher = ts.getAs[Long]("teacher"); val student = ts.getAs[Long]("student")
    val bestT = Analytics.bestLapPerDriver(laps)
      .filter(col("Driver") === teacher).head.getAs[Long]("LapNumber")
    val bestS = Analytics.bestLapPerDriver(laps)
      .filter(col("Driver") === student).head.getAs[Long]("LapNumber")
    val aligned = Analytics.alignLaps(wh, teacher, bestT, student, bestS).cache()
    assert(aligned.count() > 100)
    // grid alignment: every Distance is a multiple of 10
    assert(aligned.filter(col("Distance") % 10 =!= 0).count() === 0L)
    val zones = Analytics.problemZones(aligned, k = 15.0)
    assert(zones.count() <= 5)
    zones.collect().foreach { r =>
      assert(r.getAs[Float]("max_loss") > 15.0f)
      assert(r.getAs[Float]("length") >= 50.0f)
    }
  }

  test("dashboard stats + driver list") {
    val s = Analytics.dashboardStats(wh).head
    assert(s.getAs[Long]("n_drivers") === 20L)
    assert(s.getAs[Float]("track_length") > 4000.0f)
    val dl = Analytics.driverList(wh).collect().map(_.getLong(0))
    assert(dl.length === 20 && dl.toSeq === dl.sorted.toSeq)
  }

  test("sequence windows: shape, stride, and scaling bounds") {
    val trackLen = Analytics.dashboardStats(wh).head.getAs[Float]("track_length")
    val slice = wh.filter(col("Driver") === 1)
    val scaled = SequenceWindows.scaled(slice, trackLen.toDouble)
    val win1 = SequenceWindows.windows(scaled, seqLen = 20, stride = 1).cache()
    val row = win1.head
    val window = row.getAs[scala.collection.Seq[scala.collection.Seq[Float]]]("window")
    assert(window.length === 20)
    assert(window.head.length === 5)
    window.flatten.foreach(v => assert(v >= -0.01f && v <= 1.2f))
    // stride 5 keeps ~1/5 of the windows
    val n1 = win1.count()
    val n5 = SequenceWindows.windows(scaled, 20, 5).count()
    assert(math.abs(n5 - n1 / 5.0) <= n1 * 0.05 + 20)
  }

  test("compat view exposes reference column names; base lap time guards like the dashboard") {
    import spark.implicits._
    // rename quirks: LapTime_Sec -> LapTimeSeconds, nGear -> Gear
    val compat = Analytics.compatView(laps.toDF())
    assert(compat.columns.contains("LapTimeSeconds"))
    assert(!compat.columns.contains("LapTime_Sec"))
    // idempotent: applying twice changes nothing
    assert(Analytics.compatView(compat).columns.toSeq === compat.columns.toSeq)

    // guard 1: column present with plausible minimum → use it
    val base = Analytics.baseLapTime(compat)
    assert(base > 10.0 && base < 300.0)
    // guard 2: column missing entirely → fallback, no crash
    // (F1_web_dashboard_app.py:322-327 behavior)
    assert(Analytics.baseLapTime(compat.drop("LapTimeSeconds")) === 90.0)
    // guard 3: empty frame → fallback
    assert(Analytics.baseLapTime(compat.filter(lit(false))) === 90.0)
    // guard 4: implausible (≤ 10 s) minimum → fallback
    val bogus = Seq(1.0, 5.0).toDF("LapTimeSeconds")
    assert(Analytics.baseLapTime(bogus) === 90.0)
  }

  test("strategy curve: monotone degradation and strict bias") {
    val c = Analytics.strategyCurve(spark, baseTime = 90.0, laps = 10,
      compoundFactor = 2.0).collect()
    assert(c.length === 10)
    val times = c.sortBy(_.getAs[Int]("lap")).map(_.getAs[Double]("lap_time"))
    assert(times.sliding(2).forall { case Array(a, b) => b > a })
    c.foreach(r => assert(math.abs(
      r.getAs[Double]("strict_estimate") - r.getAs[Double]("lap_time") * 1.05) < 1e-9))
  }
}
