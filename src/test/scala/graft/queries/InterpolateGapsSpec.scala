package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InterpolateGapsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("observed rows pass through; interior nulls fill; edge nulls stay null") {
    val df = SparkEntry.queries("w_interpolate_gaps")(spark, sfDir).cache()
    try {
      // pass-through: filled_q == round(v_obs*100) wherever observed
      val bad = df.filter(col("v_obs").isNotNull &&
        col("filled_q") =!= round(col("v_obs") * 100, 0).cast("long")).count()
      assert(bad === 0L)
      // planted nulls exist and a decent share are interpolated
      val nulls = df.filter(col("v_obs").isNull).count()
      val filled = df.filter(col("interpolated")).count()
      assert(nulls > 0L && filled > 0L && filled <= nulls)
      // every filled value sits within its neighbors' range is implied
      // by lerp; spot-check global envelope in centi-units
      val env = df.agg(min(col("filled_q")), max(col("filled_q"))).head
      assert(env.getLong(0) >= 0L && env.getLong(1) <= 100000L)
    } finally { df.unpersist(); () }
  }

  test("midpoint gap fills to the exact integer average of its neighbors") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val before = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // times 0, 500, 1000: the null at 500 is the exact midpoint of
    // 10.00 and 20.00 → 15.00 (1500 centi-units)
    val ev = Seq(
      (1L, 1L, 0L, Some(10.0)),
      (2L, 1L, 500L, None: Option[Double]),
      (3L, 1L, 1000L, Some(20.0))
    ).toDF("event_id", "user_id", "ev_us", "v_obs")
    val out = ev
      .withColumn("vq", round(col("v_obs") * 100, 0).cast("long"))
      .withColumn("prev_vq", last(col("vq"), ignoreNulls = true).over(before))
      .withColumn("prev_us",
        last(when(col("vq").isNotNull, col("ev_us")), ignoreNulls = true).over(before))
      .withColumn("next_vq", first(col("vq"), ignoreNulls = true).over(after))
      .withColumn("next_us",
        first(when(col("vq").isNotNull, col("ev_us")), ignoreNulls = true).over(after))
      .withColumn("filled_q",
        when(col("vq").isNotNull, col("vq"))
          .when(col("prev_vq").isNotNull && col("next_vq").isNotNull,
            expr("(prev_vq * (next_us - ev_us) + next_vq * (ev_us - prev_us)) div (next_us - prev_us)"))
          .otherwise(lit(null).cast("long")))
      .orderBy(col("event_id"))
      .collect().map(r => Option(r.get(r.fieldIndex("filled_q"))).map(_.asInstanceOf[Long]))
    assert(out.toSeq === Seq(Some(1000L), Some(1500L), Some(2000L)))
  }
}
