package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def brute(pts: Seq[(Long, Double, Double)]) =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y) }
    }.map(_._1).toSet

  test("hand case: dominated points drop, duplicates both survive") {
    import spark.implicits._
    val pts = Seq(
      (1L, 1.0, 5.0), (2L, 2.0, 3.0), (3L, 2.0, 3.0), // dup frontier pt
      (4L, 3.0, 3.0),  // dominated by 2 (x strictly larger, y equal)
      (5L, 4.0, 1.0),
      (6L, 4.0, 2.0),  // dominated by 5 (same x, larger y)
      (7L, 0.5, 9.0))
    val out = Skyline.frontier(pts.toDF("id", "x", "y"), "x", "y",
      buckets = 4).select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L, 5L, 7L))
    assert(out === brute(pts))
  }

  test("randomized parity vs the quadratic definition") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 3) {
      val pts = (1 to 500).map(i => (i.toLong,
        rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
      val out = Skyline.frontier(
        pts.toDF("id", "x", "y").repartition(7), "x", "y")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(out === brute(pts), s"trial $trial")
    }
  }

  test("degenerate: all points share one x (single bucket, span 0)") {
    import spark.implicits._
    val pts = Seq((1L, 2.0, 7.0), (2L, 2.0, 4.0), (3L, 2.0, 4.0))
    val out = Skyline.frontier(pts.toDF("id", "x", "y"), "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 3L))
  }

  test("plan: no cartesian/nested-loop beyond the 1-row stats broadcast") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i * 1.0, (100 - i) * 1.0))
      .toDF("id", "x", "y")
    val plan = Skyline.frontier(df, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only BNLJ allowed is the 1-row min/max stats cross join; it
    // prints twice because the bucketed distinct-x subtree feeds both
    // the prefix table and the tagging branch (the GlobalRank shape)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 2)
  }
}
