package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private case class Ev(ev_ts: java.sql.Timestamp, event_type: String, value: Double)
  private def ts(minute: Int) = new java.sql.Timestamp(
    java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli + minute * 60000L)

  test("watermarked tumbling windows: finalized windows emit; late rows beyond watermark are dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDS().toDF("ev_ts", "event_type", "value")
    val q = StreamOps.windowedCounts(df, "ev_ts", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0))
      q.processAllAvailable()
      // watermark hasn't passed the window end → nothing finalized
      assert(spark.table("win_out").count() === 0L)
      // event at 01:30 pushes watermark to 01:20 → hour-0 window closes
      input.addData((ts(90), "click", 5.0))
      q.processAllAvailable()
      // a late row for hour 0 arriving after the close must be dropped
      input.addData((ts(7), "click", 99.0))
      q.processAllAvailable()
      input.addData((ts(200), "view", 1.0)) // push watermark past hour 1
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      val hour0 = rows.filter(_.getAs[java.sql.Timestamp]("window_start")
        .toInstant.toString.startsWith("2024-01-01T00:"))
      assert(hour0.length === 1)
      assert(hour0.head.getAs[Long]("n") === 2L) // late 99.0 row excluded
      assert(math.abs(hour0.head.getAs[Double]("total_value") - 3.0) < 1e-9)
    } finally q.stop()
  }

  test("stream-static enrichment: micro-batched join + rollup equals the batch form") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "FRANCE"), (2L, "KENYA"), (3L, "PERU"))
      .toDF("user_id", "n_name")
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDS().toDF("ev_ts", "user_id", "value")
    val q = StreamOps.staticEnrich(df, dim, "user_id", "n_name")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    val batch1 = Seq((ts(5), 1L, 1.0), (ts(20), 2L, 2.0), (ts(40), 9L, 7.0))
    val batch2 = Seq((ts(50), 1L, 3.0)) // same hour, later micro-batch
    val batch3 = Seq((ts(300), 3L, 1.0)) // watermark push closes hour 0
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      input.addData(batch3); q.processAllAvailable()
      val streamed = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val all = (batch1 ++ batch2 ++ batch3).toDF("ev_ts", "user_id", "value")
      val expectedHour0 = StreamOps.staticEnrich(all, dim, "user_id", "n_name",
        watermarked = false)
        .filter(col("window_start_us") === 1704067200000000L) // 2024-01-01T00
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === expectedHour0)
      // the unmatched user (9L) is dropped; same-hour rows from
      // different micro-batches merged into one row per nation
      assert(streamed.map(_._2) === Set("FRANCE", "KENYA"))
      assert(streamed.find(_._2 == "FRANCE").get._3 === 2L)
    } finally q.stop()
  }

  test("session windows: streaming merge across micro-batches equals the batch form") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDS().toDF("ev_ts", "event_type", "value")
    val q = StreamOps.sessionCounts(df, "ev_ts", gap = "30 minutes",
      lateness = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // one session split across micro-batches (gaps < 30 min), then a
    // ≥30-min gap opens a second session; a far-future event closes both
    val batch1 = Seq((ts(0), "click", 1.0), (ts(10), "click", 2.0))
    val batch2 = Seq((ts(25), "click", 3.0)) // merges into session 1
    val batch3 = Seq((ts(60), "click", 4.0)) // 35-min gap → session 2
    val batch4 = Seq((ts(600), "view", 1.0)) // watermark push
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      input.addData(batch3); q.processAllAvailable()
      input.addData(batch4); q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter(col("event_type") === "click").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
        .toSet
      // batch form over the union of all events must agree
      val all = (batch1 ++ batch2 ++ batch3 ++ batch4).toDF("ev_ts", "event_type", "value")
      val expected = StreamOps.sessionCounts(all, "ev_ts", gap = "30 minutes",
        watermarked = false)
        .filter(col("event_type") === "click").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed === expected)
      assert(streamed.size === 2) // the cross-batch merge actually merged
      assert(streamed.map(_._3) === Set(3L, 1L))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch attribution join") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val vDf = vIn.toDS().toDF("user_id", "view_id", "view_ts")
    val pDf = pIn.toDS().toDF("user_id", "purchase_id", "purchase_ts", "purchase_value")
    val q = StreamOps.attributionJoin(vDf, pDf, maxLag = "2 hours")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // views and purchases arrive in different micro-batches; purchase
      // 201 (150 min after view 100) is outside the 2 h window, user
      // 2's purchase has no prior view
      vIn.addData((1L, 100L, ts(0)), (3L, 101L, ts(30)))
      q.processAllAvailable()
      pIn.addData((1L, 200L, ts(60), 9.5), (1L, 201L, ts(150), 1.0),
        (2L, 202L, ts(10), 3.0))
      q.processAllAvailable()
      vIn.addData((3L, 102L, ts(90))) // second view also catches p 203
      pIn.addData((3L, 203L, ts(95), 7.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      val allV = Seq((1L, 100L, ts(0)), (3L, 101L, ts(30)), (3L, 102L, ts(90)))
        .toDF("user_id", "view_id", "view_ts")
      val allP = Seq((1L, 200L, ts(60), 9.5), (1L, 201L, ts(150), 1.0),
        (2L, 202L, ts(10), 3.0), (3L, 203L, ts(95), 7.0))
        .toDF("user_id", "purchase_id", "purchase_ts", "purchase_value")
      val expected = StreamOps.attributionJoin(allV, allP, maxLag = "2 hours",
        watermarked = false).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(streamed === expected)
      // 100→200 (60 min), 101→203 (65 min), 102→203 (5 min);
      // 201 out-of-window, 202 orphan
      assert(streamed.map(t => (t._2, t._3)) ===
        Set((100L, 200L), (101L, 203L), (102L, 203L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join: unconverted views emit null-padded after watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val vDf = vIn.toDS().toDF("user_id", "view_id", "view_ts")
    val pDf = pIn.toDS().toDF("user_id", "purchase_id", "purchase_ts", "purchase_value")
    val q = StreamOps.attributionJoinOuter(vDf, pDf, maxLag = "2 hours",
      lateness = "10 minutes")
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      // user 1 converts; user 5 never does
      vIn.addData((1L, 100L, ts(0)), (5L, 110L, ts(0)))
      pIn.addData((1L, 200L, ts(60), 9.5))
      q.processAllAvailable()
      // matched row may emit immediately; the unmatched one must NOT
      // emit before the watermark can rule out a future purchase
      val early = spark.table("attr_outer_out")
        .filter(col("view_id") === 110L).count()
      assert(early === 0L, "outer row emitted before watermark closed the window")
      // advance both watermarks far past view_ts + maxLag + lateness
      vIn.addData((9L, 900L, ts(400)))
      pIn.addData((9L, 901L, ts(400), 1.0))
      q.processAllAvailable()
      // watermark is applied at the START of the next batch — feed one
      // more round so the state store evicts and emits the null row
      vIn.addData((9L, 902L, ts(401)))
      pIn.addData((9L, 903L, ts(401), 1.0))
      q.processAllAvailable()
      val out = spark.table("attr_outer_out").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getBoolean(5))).toSet
      assert(out.contains((100L, 200L, true)))
      assert(out.contains((110L, -1L, false)),
        s"expected null-padded unconverted view; got $out")
      // batch twin agrees on the full input
      val allV = Seq((1L, 100L, ts(0)), (5L, 110L, ts(0)), (9L, 900L, ts(400)),
        (9L, 902L, ts(401))).toDF("user_id", "view_id", "view_ts")
      val allP = Seq((1L, 200L, ts(60), 9.5), (9L, 901L, ts(400), 1.0),
        (9L, 903L, ts(401), 1.0))
        .toDF("user_id", "purchase_id", "purchase_ts", "purchase_value")
      val batch = StreamOps.attributionJoinOuter(allV, allP, watermarked = false)
        .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getBoolean(5))).toSet
      assert(batch.filter(t => Set(100L, 110L).contains(t._1)) ===
        out.filter(t => Set(100L, 110L).contains(t._1)))
    } finally q.stop()
  }

  test("throttled parquet session recording end-to-end") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("session").toString
    val input = MemoryStream[PacketCodec.LivePacket]
    val q = StreamOps.recordSession(
      LiveMerge.merged(input.toDS()).toDF(), s"$dir/data", s"$dir/ckpt")
    try {
      input.addData(
        PacketCodec.decode(10000L, PacketCodec.telemetryFrame(0, 250, 0.9f, 0.1f, 7, 11000)).get,
        PacketCodec.decode(250000L, PacketCodec.lapFrame(0, 2500f, 12)).get)
      q.processAllAvailable()
      val recorded = spark.read.parquet(s"$dir/data")
      assert(recorded.count() === 1L)
      val r = recorded.head
      assert(r.getAs[Int]("Speed") === 250)
      assert(r.getAs[Int]("LapNumber") === 12)
    } finally q.stop()
  }

  test("inference hook: batched predictions over sequence windows") {
    val wh = spark.read.parquet(
      "/root/reference/f1_processed_warehouse/year=2021/round=12/telemetry.parquet")
      .filter(col("Driver") === 44)
    val scaled = graft.f1.SequenceWindows.scaled(wh, 7004.0)
    val wins = graft.f1.SequenceWindows.windows(scaled, 20, 5)
    val preds = graft.ml.InferenceHook.withPredictions(
      wins, graft.ml.InferenceHook.MeanSpeedStub)
    val rows = preds.collect()
    assert(rows.nonEmpty)
    // stub predicts the window-mean of scaled speed: bounded like input
    rows.foreach { r =>
      val p = r.getAs[Float]("prediction")
      assert(p >= 0f && p <= 1.0f)
    }
  }

  test("soak: session-window and dedup state plateaus under the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // The 100 TB claim the operators make is "state is bounded by the
    // watermark horizon, not stream length". Feed 30 rounds of steadily
    // advancing event time and watch the state-store row counts: they
    // must plateau (eviction is really happening), not grow with rounds.
    val sIn = MemoryStream[(java.sql.Timestamp, String, Double)]
    val sq = StreamOps.sessionCounts(
      sIn.toDS().toDF("ev_ts", "event_type", "value"),
      gap = "30 minutes", lateness = "10 minutes")
      .writeStream.format("memory").queryName("soak_sess")
      .outputMode("append").start()
    val dIn = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val dq = StreamOps.exactlyOnce(
      dIn.toDS().toDF("event_id", "ev_ts", "event_type", "value"))
      .writeStream.format("memory").queryName("soak_dedup")
      .outputMode("append").start()
    try {
      def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val rounds = 30
      val idsPerRound = 50
      val sSizes = Array.ofDim[Long](rounds)
      val dSizes = Array.ofDim[Long](rounds)
      for (round <- 0 until rounds) {
        val base = round * 60 // each round jumps one hour of event time
        sIn.addData((0 until 10).map(i => (ts(base + i), "click", 1.0)): _*)
        sq.processAllAvailable()
        dIn.addData((0 until idsPerRound).map(i =>
          (round.toLong * idsPerRound + i, ts(base + i % 10), "click", 1.0)): _*)
        dq.processAllAvailable()
        sSizes(round) = stateRows(sq)
        dSizes(round) = stateRows(dq)
      }
      // plateau: the late-phase state never exceeds the early steady state
      assert(sSizes.drop(rounds - 5).max <= sSizes.slice(3, 10).max,
        s"session state grew: ${sSizes.mkString(",")}")
      assert(dSizes.drop(rounds - 5).max <= dSizes.slice(3, 10).max,
        s"dedup state grew: ${dSizes.mkString(",")}")
      // and dedup state holds a watermark horizon, not the full history
      assert(dSizes.last < rounds.toLong * idsPerRound / 2,
        s"dedup state ${dSizes.last} ~ full history ${rounds * idsPerRound}")
    } finally { sq.stop(); dq.stop() }
  }

  test("exactly-once dedup drops cross-batch redeliveries within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = input.toDS().toDF("event_id", "ev_ts", "event_type", "value")
    val q = StreamOps.exactlyOnce(df)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "click", 1.0), (2L, ts(1), "click", 2.0))
      q.processAllAvailable()
      // same ids redelivered in a LATER micro-batch → must be dropped
      input.addData((1L, ts(0), "click", 1.0), (3L, ts(2), "view", 3.0))
      q.processAllAvailable()
      input.addData((2L, ts(1), "click", 2.0), (2L, ts(1), "click", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted === Array(1L, 2L, 3L))
    } finally q.stop()
  }
}
