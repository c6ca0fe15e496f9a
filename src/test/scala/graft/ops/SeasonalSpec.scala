package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SeasonalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("planted diurnal pattern is absorbed by seasonal; injected spike flags") {
    // 14 days of hourly points: flat trend 100, +50 at phase 9 (the
    // "9am surge"), one true incident of +500 at day 7 phase 15
    val rows = for (day <- 0 until 14; h <- 0 until 24) yield {
      val t = (day * 24 + h) * 3600000000L
      val base = 100.0 + (if (h == 9) 50.0 else 0.0)
      val v = base + (if (day == 7 && h == 15) 500.0 else 0.0)
      ("s", t, v)
    }
    val df = rows.toDF("series", "t", "v")
    val out = Seasonal.decompose(df, "series", "t", "v",
      bucketUs = 3600000000L, period = 24).cache()

    val anomalies = out.filter($"is_anomaly").collect()
    assert(anomalies.length == 1, "only the injected incident flags")
    assert(anomalies.head.getLong(1) == 7 * 24 + 15)

    // the 9am surge is NOT an anomaly: seasonal absorbs it
    val nineAm = out.filter($"phase" === 9 && !$"is_anomaly").count()
    assert(nineAm == 14, "all recurring surges classed as seasonal")
    out.unpersist()
  }

  test("additivity: y = trend + seasonal + resid exactly") {
    val rows = for (i <- 0 until 100)
      yield ("a", i * 1000000L, (i % 7).toDouble * 3 + 10)
    val out = Seasonal.decompose(rows.toDF("s", "t", "v"), "s", "t", "v",
      bucketUs = 1000000L, period = 7)
    val bad = out.filter(
      org.apache.spark.sql.functions.abs(
        $"y" - $"trend" - $"seasonal" - $"resid") > 1e-9).count()
    assert(bad == 0)
  }

  test("pure seasonal series has ~zero residuals away from the edges") {
    val rows = for (i <- 0 until 96)
      yield ("a", i * 1000000L, (i % 4).toDouble * 10)
    val out = Seasonal.decompose(rows.toDF("s", "t", "v"), "s", "t", "v",
      bucketUs = 1000000L, period = 4)
    // interior buckets (full centered window): residual is small —
    // bounded by the classical edge bias that the few clipped-window
    // buckets leak into the phase means (~period/n of the amplitude),
    // NOT by float noise: |resid| ≤ ~0.42 here vs signal amplitude 30
    val interior = out.filter($"bucket" >= 2 && $"bucket" < 94)
    val maxAbs = interior.agg(
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.abs($"resid"))).head().getDouble(0)
    assert(maxAbs < 1.0, s"interior residual << amplitude, got $maxAbs")
  }
}
