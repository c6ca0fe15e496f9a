package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TimeGridSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def ev(rows: (Long, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ev_us", "event_id", "value")
  }

  private def run(step: Long, rows: (Long, Long, Long, Double)*) =
    TimeGrid.resampleFfill(ev(rows: _*), step).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t_us")) ->
        (r.getAs[Long]("asof_us"), r.getAs[Double]("value")))
      .toMap

  test("grid is epoch-aligned and spans [ceil(lo/step), floor(hi/step)]") {
    // events at 15 and 47, step 10 -> grid points 20, 30, 40
    val got = run(10L, (1L, 15L, 1L, 1.5), (1L, 47L, 2L, 4.7))
    assert(got.keySet === Set((1L, 20L), (1L, 30L), (1L, 40L)))
    // all three fill from the event at 15
    assert(got((1L, 20L)) === ((15L, 1.5)))
    assert(got((1L, 40L)) === ((15L, 1.5)))
  }

  test("fill switches exactly at the event time (inclusive <=)") {
    val got = run(10L, (1L, 0L, 1L, 1.0), (1L, 20L, 2L, 2.0),
      (1L, 35L, 3L, 3.0))
    assert(got((1L, 10L)) === ((0L, 1.0)))
    assert(got((1L, 20L)) === ((20L, 2.0))) // grid point ON the event
    assert(got((1L, 30L)) === ((20L, 2.0)))
  }

  test("equal-timestamp events collapse to the max event_id") {
    val got = run(10L, (1L, 5L, 2L, 9.9), (1L, 5L, 7L, 1.1),
      (1L, 25L, 8L, 5.0))
    assert(got((1L, 10L)) === ((5L, 1.1))) // event_id 7 wins
  }

  test("a user whose span contains no grid multiple yields no rows") {
    val got = run(100L, (1L, 110L, 1L, 1.0), (1L, 150L, 2L, 2.0),
      (2L, 205L, 3L, 7.0), (2L, 290L, 4L, 8.0))
    // user 1: [110,150] has no multiple of 100; user 2: [205,290] none
    assert(got.isEmpty)
  }
}
