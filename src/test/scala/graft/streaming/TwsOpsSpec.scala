package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TwsOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("transformWithState running stats over a multi-batch replay equals the batch aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val input = MemoryStream[(Long, Long)]
    val q = TwsOps.runningStats(input.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    // three micro-batches; user 1 appears in all, user 2 in two,
    // user 3 once — exercises state carry across batch boundaries
    val feed = Seq(
      Seq((1L, 10L), (2L, 5L), (1L, -3L)),
      Seq((1L, 7L), (3L, 100L)),
      Seq((2L, 2L), (1L, 1L)))
    try {
      feed.foreach { b => input.addData(b); q.processAllAvailable() }
      // last emission per user = converged running state
      val got = spark.table("tws_out")
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("sum_q"))).as("m"))
        .select(col("user_id"), col("m.n"), col("m.sum_q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val expect = feed.flatten.groupBy(_._1).map { case (u, rows) =>
        (u, rows.size.toLong, rows.map(_._2).sum)
      }.toSet
      assert(got === expect)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("event-time timers close idle sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    def ts(sec: Int) = new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDS().toDF("user_id", "ev_ts")
      .withWatermark("ev_ts", "0 seconds")
    val q = TwsOps.gapSessions(events, gapMs = 10000L) // 10 s gap
      .writeStream.format("memory").queryName("tws_sess")
      .outputMode("append").start()
    try {
      // user 1: events at 0s and 5s (one session); user 2: event at 3s
      input.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(3)))
      q.processAllAvailable()
      assert(spark.table("tws_sess").count() === 0L) // nothing closed yet
      // user 1 reappears at 40s: closes its own old session INLINE
      // (gap exceeded within the key) and the watermark jumping to 40s
      // fires user 2's timer (3s + 10s < 40s) — no user-2 event needed
      input.addData((1L, ts(40)))
      q.processAllAvailable()
      input.addData((3L, ts(200))) // push watermark past 40s + gap
      q.processAllAvailable()
      val rows = spark.table("tws_sess")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      assert(rows.contains((1L, base, base + 5000L, 2L))) // first u1 session
      assert(rows.contains((2L, base + 3000L, base + 3000L, 1L))) // timer-closed
      assert(rows.contains((1L, base + 40000L, base + 40000L, 1L))) // second u1
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("a late within-watermark event extends the session START boundary") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    def ts(sec: Int) = new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli + sec * 1000L)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDS().toDF("user_id", "ev_ts")
      .withWatermark("ev_ts", "30 seconds")
    val q = TwsOps.gapSessions(events, gapMs = 10000L)
      .writeStream.format("memory").queryName("tws_sess_late")
      .outputMode("append").start()
    try {
      // batch 1 opens the session at 20s; batch 2 delivers a LATE event
      // at 15s (inside the 30 s watermark) that PREDATES the open start
      input.addData((1L, ts(20)))
      q.processAllAvailable()
      input.addData((1L, ts(15)))
      q.processAllAvailable()
      input.addData((2L, ts(200))) // watermark past 20s + gap → closes
      q.processAllAvailable()
      val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      val rows = spark.table("tws_sess_late")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // event-time-ordered answer: one session [15s, 20s] with 2 events
      assert(rows.contains((1L, base + 15000L, base + 20000L, 2L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("ListState recent-N buffer stays bounded and equals the batch top-N") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val input = MemoryStream[(Long, Long, String)]
    val q = TwsOps.recentEvents(input.toDS(), n = 3)
      .writeStream.format("memory").queryName("tws_recent")
      .outputMode("update").start()
    val feed = Seq(
      Seq((1L, 10L, "a"), (1L, 20L, "b")),
      Seq((1L, 5L, "c"), (1L, 30L, "d")), // 4 seen: buffer must trim to 3
      Seq((1L, 40L, "e"), (2L, 7L, "x")))
    try {
      feed.foreach { b => input.addData(b); q.processAllAvailable() }
      val last = spark.table("tws_recent")
        .groupBy("user_id")
        .agg(max(struct(size(col("recent_ms")), col("recent_ms"),
          col("recent_types"))).as("m"))
      val u1 = last.filter(col("user_id") === 1L)
        .select(col("m.recent_ms")).as[Seq[Long]].head()
      // batch equivalent: u1's 3 newest of {10,20,5,30,40}
      assert(u1 === Seq(40L, 30L, 20L))
      val u2 = last.filter(col("user_id") === 2L)
        .select(col("m.recent_ms")).as[Seq[Long]].head()
      assert(u2 === Seq(7L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("MapState per-type counters equal the batch groupBy across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val input = MemoryStream[(Long, String)]
    val q = TwsOps.typeCounts(input.toDS())
      .writeStream.format("memory").queryName("tws_counts")
      .outputMode("update").start()
    val feed = Seq(
      Seq((1L, "click"), (1L, "view"), (2L, "click")),
      Seq((1L, "click"), (2L, "click"), (2L, "buy")))
    try {
      feed.foreach { b => input.addData(b); q.processAllAvailable() }
      // counters only grow, so the max per (user, type) across all
      // emissions is the converged count
      val last = spark.table("tws_counts")
        .select(col("user_id"), explode(col("counts")).as(Seq("tpe", "n")))
        .groupBy("user_id", "tpe").agg(max(col("n")).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val expect = feed.flatten.groupBy(x => x).map { case ((u, t), xs) =>
        (u, t) -> xs.size.toLong
      }
      assert(last === expect)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("batch gate form: micro-unit integerization is a plain exact aggregate") {
    import spark.implicits._
    val events = Seq((1L, 1.25), (1L, 2.5), (2L, -0.75))
      .toDF("user_id", "value")
    val got = TwsOps.runningStatsBatch(events)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 3750000L), (2L, 1L, -750000L)))
  }
}
