package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("funnel cascade: strictly-after ordering, sentinel for unreached stages") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE the first view — stage 2 not reached by
      // that click; a later click counts
      (2L, "click", 50L), (2L, "view", 100L), (2L, "click", 150L),
      // user 3: purchase before click — purchase must not count
      (3L, "view", 10L), (3L, "purchase", 20L), (3L, "click", 30L),
      // user 4: no view at all — excluded entirely
      (4L, "click", 10L), (4L, "purchase", 20L),
      // user 5: same-timestamp click as view (strictly after ⇒ no)
      (5L, "view", 10L), (5L, "click", 10L)
    ).toDF("user_id", "event_type", "ev_us")
    val got = Funnel.stages3(ev, "view", "click", "purchase").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((100L, 200L, 300L)))
    assert(got(2L) === ((100L, 150L, -1L)))
    assert(got(3L) === ((10L, 30L, -1L))) // purchase@20 < click@30 → unreached
    assert(!got.contains(4L))
    assert(got(5L) === ((10L, -1L, -1L))) // click not strictly after
  }

  test("streaming funnel across micro-batches equals the batch cascade") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = Funnel.stagesStream(
        input.toDS().toDF("user_id", "event_type", "ev_us"),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    // stage progress split across batches: user 1 completes over 3
    // batches, user 2 stalls (click before view in time), user 3 only
    // reaches stage 1
    val b1 = Seq((1L, "view", 100L), (2L, "click", 50L), (3L, "view", 10L))
    val b2 = Seq((1L, "click", 200L), (2L, "view", 100L), (3L, "error", 20L))
    val b3 = Seq((1L, "purchase", 300L), (2L, "click", 150L))
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // monotone state ⇒ the max-`filled` emission per user IS final
      val got = spark.table("funnel_stream").collect()
        .groupBy(_.getLong(0))
        .map { case (u, rows) =>
          val last = rows.maxBy(_.getInt(1))
          u -> (last.getLong(2), last.getLong(3), last.getLong(4))
        }
      val batch = Funnel.stages3(
          (b1 ++ b2 ++ b3).toDF("user_id", "event_type", "ev_us"),
          "view", "click", "purchase")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      // streaming also emits never-qualified users (state exists);
      // compare on the batch result's support
      batch.foreach { case (u, t) => assert(got(u) === t, s"user $u") }
      assert(got(1L) === ((100L, 200L, 300L)))
    } finally q.stop()
  }

  test("hot-key soak: one user with 10^6 events runs in O(stages) state") {
    import spark.implicits._
    // A bot-grade key: 10^6 click events for one user, the funnel's
    // view at t=0 and purchase at the very end. The old toArray kernel
    // materialized all 10^6 rows per task; the sorted-stream cascade
    // holds three longs (the sort itself spills via Spark's external
    // sorter if the partition outgrows task memory).
    val n = 1000000L
    val hot = spark.range(1, n + 1)
      .select(lit(42L).as("user_id"), lit("click").as("event_type"),
        col("id").as("ev_us"))
    val edges = Seq((42L, "view", 0L), (42L, "purchase", n + 1),
      (7L, "view", 5L)).toDF("user_id", "event_type", "ev_us")
    val got = Funnel.stages3(hot.unionAll(edges), "view", "click", "purchase")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(42L) === ((0L, 1L, n + 1)))
    assert(got(7L) === ((5L, -1L, -1L)))
  }
}
