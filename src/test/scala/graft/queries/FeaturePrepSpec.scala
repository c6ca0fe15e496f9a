package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical invariants of the ML feature-prep gates. */
class FeaturePrepSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("z-scores average ~0 with stddev ~1 per group; min-max lands in [0,1]") {
    val df = SparkEntry.queries("p_feature_scale")(spark, sfDir).cache()
    try {
      df.groupBy("event_type")
        .agg(avg(col("z")).as("mz"), stddev_pop(col("z")).as("sz"),
          min(col("mm")).as("lo"), max(col("mm")).as("hi"))
        .collect().foreach { r =>
          assert(math.abs(r.getDouble(1)) < 1e-3, s"${r.getString(0)} mean z")
          assert(math.abs(r.getDouble(2) - 1.0) < 1e-3, s"${r.getString(0)} std z")
          assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 1.0,
            s"${r.getString(0)} min-max range")
        }
    } finally { df.unpersist(); () }
  }

  test("winsorize clamps ~10% of rows and bounds values to [p05, p95]") {
    val df = SparkEntry.queries("p_winsorize")(spark, sfDir).cache()
    try {
      val n = df.count()
      val clamped = df.filter(col("clamped")).count()
      val frac = clamped.toDouble / n
      assert(frac > 0.04 && frac < 0.16, s"clamped fraction $frac")
      // winsorized values never exceed the raw-value envelope and
      // un-clamped rows pass through exactly
      assert(df.filter(!col("clamped") &&
        round(col("value"), 6) =!= col("winsorized")).count() === 0L)
    } finally { df.unpersist(); () }
  }

  test("mode: per-user winner matches a hand fold over the counts") {
    val ev = QueryDsl.events(spark, sfDir)
    val counts = ev.groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).map { case (u, rows) =>
      u -> rows.minBy(t => (-t._3, t._2))._2
    }
    val got = SparkEntry.queries("a_mode")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === expected)
  }

  test("quartile buckets split each group ~25/25/25/25") {
    val df = SparkEntry.queries("p_quantile_bucket")(spark, sfDir)
    val counts = df.groupBy("event_type", "bucket").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    counts.foreach { case ((g, b), n) =>
      assert(b >= 1 && b <= 4)
      val frac = n.toDouble / totals(g)
      assert(frac > 0.15 && frac < 0.35, s"group $g bucket $b holds $frac")
    }
  }
}
