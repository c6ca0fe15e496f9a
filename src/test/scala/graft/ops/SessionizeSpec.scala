package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  // (user, us, id, type) rows; gap threshold 100 us in tests
  private def df(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ev_us", "event_id", "event_type")
  }

  private def run(rows: (Long, Long, Long, String)*) =
    Sessionize.sessions(df(rows: _*), gapUs = 100L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("start_us"),
          r.getAs[Long]("duration_us"), r.getAs[Long]("n_types")))
      .toMap

  test("gap > threshold starts a new session; gap == threshold does not") {
    val got = run(
      (1L, 0L, 1L, "view"), (1L, 100L, 2L, "view"),   // gap 100 = keep
      (1L, 201L, 3L, "click"),                        // gap 101 > 100 = cut
      (1L, 300L, 4L, "view"))
    assert(got === Map(
      (1L, 1L) -> ((2L, 0L, 100L, 1L)),
      (1L, 2L) -> ((2L, 201L, 99L, 2L))))
  }

  test("users are independent; single-event sessions have zero duration") {
    val got = run((1L, 0L, 1L, "view"), (2L, 5L, 2L, "click"),
      (2L, 500L, 3L, "view"))
    assert(got === Map(
      (1L, 1L) -> ((1L, 0L, 0L, 1L)),
      (2L, 1L) -> ((1L, 5L, 0L, 1L)),
      (2L, 2L) -> ((1L, 500L, 0L, 1L))))
  }

  test("equal timestamps break ties on event_id and never split") {
    val got = run((1L, 10L, 2L, "a"), (1L, 10L, 1L, "b"), (1L, 10L, 3L, "a"))
    assert(got === Map((1L, 1L) -> ((3L, 10L, 0L, 2L))))
  }

  test("both windows share one Exchange on user_id") {
    val plan = Sessionize.sessions(
      df((1L, 0L, 1L, "a"), (1L, 300L, 2L, "b")), 100L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    // one shuffle for the windows + one for the rollup, nothing more
    assert(exchanges <= 2, s"unexpected extra shuffles:\n$plan")
  }
}
