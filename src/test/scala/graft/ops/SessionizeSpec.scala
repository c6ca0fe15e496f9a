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

  test("hot-user skew: one user with 200k events completes and is exact") {
    // The skew shape that killed the r4 funnel review: a bot account
    // owning most of the partition. Window state here is O(1) per row
    // (lag + running sum), and WindowExec sorts via a spillable
    // buffer, so a hot key costs time, not memory.
    import spark.implicits._
    val hot = (0 until 200000).map(i =>
      (1L, i.toLong * 60L, i.toLong, if (i % 3 == 0) "view" else "click"))
    val cold = (0 until 100).map(i =>
      (2L + i, i.toLong * 1000L, 300000L + i, "view"))
    val got = Sessionize.sessions((hot ++ cold)
        .toDF("user_id", "ev_us", "event_id", "event_type"), gapUs = 100L)
    // hot user: every gap is 60us <= 100 -> ONE session of 200k events
    val hotRow = got.where($"user_id" === 1L).collect()
    assert(hotRow.length === 1)
    assert(hotRow(0).getAs[Long]("n_events") === 200000L)
    assert(hotRow(0).getAs[Long]("duration_us") === 199999L * 60L)
    assert(got.count() === 101L)
  }

  test("batch sessionize agrees with Spark's built-in session_window") {
    // same gap rule, independent implementations — run both over the
    // real corpus and compare (session_window works in batch too).
    // Note: session_window treats the gap as EXCLUSIVE (gap == window
    // extends), Sessionize uses <= (inclusive keep) — equal-gap events
    // only; use a gap value no inter-event delta equals to compare.
    val ev = graft.queries.QueryDsl.events(spark, "/root/testdata/sf0.001")
    val gapUs = 30L * 60 * 1000 * 1000 + 1 // odd micros: no delta ties it
    val batch = Sessionize.sessions(ev, gapUs)
      .select("user_id", "n_events", "start_us")
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val builtin = ev
      .groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(
          col("ev_ts"), s"${gapUs} microseconds").as("sw"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"),
        min(col("ev_us")).as("start_us"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_us")) -> r.getAs[Long]("n_events")).toMap
    assert(batch === builtin)
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
