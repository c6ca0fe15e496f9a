package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import PacketCodec._
import LiveMerge._

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  // --- codec ---

  test("codec roundtrip: telemetry frame") {
    val frame = telemetryFrame(playerIdx = 3, speed = 287, throttle01 = 0.75f,
      brake01 = 0.25f, gear = 6, rpm = 11200)
    assert(frame.length === TelemetryPacketSize)
    val p = decode(1000000L, frame).get
    assert(p.packetId === PacketIdTelemetry)
    assert(p.speed.get === 287)
    assert(math.abs(p.throttle.get - 75.0) < 1e-4)
    assert(math.abs(p.brake.get - 25.0) < 1e-4)
    assert(p.gear.get === 6)
    assert(p.rpm.get === 11200)
    assert(p.distance.isEmpty)
  }

  test("codec roundtrip: lap frame") {
    val p = decode(2000000L, lapFrame(playerIdx = 0, lapDistance = 1234.5f,
      lapNumber = 7)).get
    assert(p.packetId === PacketIdLap)
    assert(math.abs(p.distance.get - 1234.5) < 1e-3)
    assert(p.lapNumber.get === 7)
    assert(p.speed.isEmpty)
  }

  test("codec drops short, foreign, and mis-sized frames") {
    assert(decode(0L, Array.fill[Byte](10)(0)).isEmpty) // < 24 bytes
    val foreign = telemetryFrame(0, 100, 0f, 0f, 1, 5000)
    foreign(5) = 9 // unknown packet id
    assert(decode(0L, foreign).isEmpty)
    val truncated = telemetryFrame(0, 100, 0f, 0f, 1, 5000).take(500)
    assert(decode(0L, truncated).isEmpty) // id 6 but wrong size
    assert(decode(0L, null).isEmpty)
  }

  test("negative gear (reverse) decodes as signed int8") {
    val p = decode(0L, telemetryFrame(0, 5, 0f, 0f, -1, 3000)).get
    assert(p.gear.get === -1)
  }

  // --- merge kernel ---

  private def tel(tsUs: Long, speed: Int = 100): LivePacket =
    decode(tsUs, telemetryFrame(0, speed, 0.5f, 0.0f, 4, 9000)).get
  private def lap(tsUs: Long, dist: Float = 500f, lapNo: Int = 3): LivePacket =
    decode(tsUs, lapFrame(0, dist, lapNo)).get

  test("no emit until both packet types present (both orders)") {
    val init = MergeState(None, None, LiveMerge.NeverEmitted)
    val (out1, _) = processPackets(1, Iterator(tel(1), tel(200000)), init, 100000)
    assert(out1.isEmpty)
    val (out2, _) = processPackets(1, Iterator(lap(1), lap(200000)), init, 100000)
    assert(out2.isEmpty)
    val (out3, _) = processPackets(1, Iterator(tel(1), lap(200000)), init, 100000)
    assert(out3.length === 1) // completes on the lap packet
    val (out4, _) = processPackets(1, Iterator(lap(1), tel(200000)), init, 100000)
    assert(out4.length === 1) // completes on the tel packet
  }

  test("throttle: bursts faster than 0.1s collapse to one emit") {
    val init = MergeState(None, None, LiveMerge.NeverEmitted)
    // 60 Hz burst: packets every ~16.6ms over 0.5s → ~5 emits, not 30
    val packets = (0 until 30).map { i =>
      val ts = i * 16667L
      if (i % 2 == 0) tel(ts, speed = 100 + i) else lap(ts)
    }
    val (out, st) = processPackets(1, packets.iterator, init, 100000)
    assert(out.length >= 3 && out.length <= 6, s"got ${out.length}")
    // emitted samples carry the latest state at emit time
    assert(out.last.Speed >= 100)
    assert(st.tel.nonEmpty && st.lap.nonEmpty)
  }

  test("last-write-wins: the newest telemetry before the emit wins") {
    val init = MergeState(None, None, LiveMerge.NeverEmitted)
    val packets = Iterator(tel(1, speed = 50), tel(2, speed = 99), lap(200000))
    val (out, _) = processPackets(1, packets, init, 100000)
    assert(out.length === 1)
    assert(out.head.Speed === 99)
    assert(out.head.LapNumber === 3)
  }

  // --- streaming end-to-end ---

  test("stateful merge over MemoryStream micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[LivePacket]
    val q = LiveMerge.merged(input.toDS())
      .writeStream.format("memory").queryName("live_out")
      .outputMode("append").start()
    try {
      // batch 1: telemetry only → nothing can emit
      input.addData(tel(10000))
      q.processAllAvailable()
      assert(spark.table("live_out").count() === 0L)
      // batch 2: lap arrives (state carried across batches) → emit
      input.addData(lap(250000))
      q.processAllAvailable()
      assert(spark.table("live_out").count() === 1L)
      val r = spark.table("live_out").head
      assert(r.getAs[Int]("Speed") === 100)
      assert(r.getAs[Int]("LapNumber") === 3)
      // batch 3: out-of-order within the batch is sorted by ts; both
      // packets clear the strict > 0.1s throttle → two emits in order
      input.addData(tel(560000, speed = 200), tel(400000, speed = 150))
      q.processAllAvailable()
      val rows = spark.table("live_out").collect().sortBy(_.getAs[Double]("Timestamp"))
      assert(rows.length === 3)
      assert(rows.map(_.getAs[Int]("Speed")).toSeq === Seq(100, 150, 200))
    } finally q.stop()
  }

  test("warm-start bootstrap: a restart seeded from the recording continues the stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // phase 1 — a normal run that ends on an emit boundary
    val in1 = MemoryStream[LivePacket]
    val q1 = LiveMerge.merged(in1.toDS())
      .writeStream.format("memory").queryName("boot_phase1")
      .outputMode("append").start()
    try {
      in1.addData(tel(10000, speed = 80), lap(20000))
      q1.processAllAvailable()
    } finally q1.stop()
    val rec = spark.table("boot_phase1")
    assert(rec.count() === 1L) // emitted at 20000

    // continuous reference: the SAME packets in one uninterrupted run
    val inC = MemoryStream[LivePacket]
    val qc = LiveMerge.merged(inC.toDS())
      .writeStream.format("memory").queryName("boot_cont")
      .outputMode("append").start()
    try {
      inC.addData(tel(10000, speed = 80), lap(20000))
      qc.processAllAvailable()
      inC.addData(lap(60000), tel(250000, speed = 180))
      qc.processAllAvailable()
    } finally qc.stop()

    // phase 2 — a NEW query warm-started from phase 1's recording:
    // the lap at 60000 is within the 100 ms throttle of the seeded
    // lastEmit (20000) → suppressed, exactly like the continuous run;
    // the tel at 250000 pairs with the SEEDED lap snapshot and emits
    val seed = LiveMerge.bootstrapFromRecording(rec)
    assert(seed.collect().head._2.lastEmitUs === 20000L) // exact round-trip
    val in2 = MemoryStream[LivePacket]
    val q2 = LiveMerge.mergedBootstrapped(in2.toDS(), seed)
      .writeStream.format("memory").queryName("boot_phase2")
      .outputMode("append").start()
    try {
      in2.addData(lap(60000), tel(250000, speed = 180))
      q2.processAllAvailable()
    } finally q2.stop()

    def rows(t: String) = spark.table(t).collect()
      .map(r => (r.getAs[Double]("Timestamp"), r.getAs[Long]("Driver"),
        r.getAs[Int]("Speed"), r.getAs[Int]("LapNumber"))).toSet
    assert(rows("boot_phase1") ++ rows("boot_phase2") === rows("boot_cont"))
    assert(rows("boot_phase2").head._3 === 180) // the warm-paired emit
  }

  test("state TTL drops a silent driver's snapshots (bounded state)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[LivePacket]
    // TimeMode.ProcessingTime (which TTL requires) keeps the query
    // running micro-batches even with no input, so processAllAvailable
    // never settles — poll the sink instead.
    def awaitCount(n: Long, timeoutMs: Long = 30000): Long = {
      val deadline = System.nanoTime + timeoutMs * 1000000L
      var c = spark.table("live_ttl").count()
      while (c < n && System.nanoTime < deadline) {
        Thread.sleep(200); c = spark.table("live_ttl").count()
      }
      c
    }
    val q = LiveMerge.merged(input.toDS(),
        stateTtl = Some(java.time.Duration.ofMillis(500)))
      .writeStream.format("memory").queryName("live_ttl")
      .outputMode("append").start()
    try {
      // telemetry snapshot enters state, nothing emits yet
      input.addData(tel(10000))
      Thread.sleep(3000) // ≥ several triggers AND past the 500 ms TTL
      assert(spark.table("live_ttl").count() === 0L)
      // WITHOUT TTL this lap packet would pair with the held telemetry
      // snapshot and emit; the expired state makes it a lone lap
      input.addData(lap(250000))
      Thread.sleep(3000)
      assert(spark.table("live_ttl").count() === 0L)
      // a fresh pair within one batch emits normally
      input.addData(tel(400000, speed = 150), lap(410000))
      assert(awaitCount(1) === 1L)
      assert(spark.table("live_ttl").head.getAs[Int]("Speed") === 150)
    } finally q.stop()
  }
}
