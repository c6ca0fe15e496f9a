package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite
import PacketCodec._
import LiveMerge._

/** E2E live-path test: replay real-shaped F1-25 frames through a REAL
  * UDP socket, run the stream through decode → merge → recordSession,
  * and require the session parquet to equal what the batch kernel
  * computes from the same frames — the full recorder loop of
  * F1-25_Telemetry_DB_Record.py:139-191, minus the game. */
class UdpBridgeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** 50 Hz deterministic receive clock (20 ms per datagram). */
  private def counterClock(): () => Long = {
    val tick = new AtomicLong(0)
    () => tick.addAndGet(20000L)
  }

  /** Interleaved telemetry/lap frames, player car in slot 3. */
  private def fixtureFrames(n: Int): Seq[Array[Byte]] =
    (0 until n).flatMap { i =>
      Seq(
        telemetryFrame(3, 250 + i, 0.8f, 0.1f, gear = 5, rpm = 11000 + i),
        lapFrame(3, 100.0f * i, 1 + i / 10))
    }

  test("UDP replay through a real socket equals the batch session log") {
    val frames = fixtureFrames(30)
    val bridge = new UdpBridge(spark, port = 0, driver = 1L, clock = counterClock())
    bridge.start()
    try {
      val sender = new DatagramSocket()
      try {
        frames.foreach { f =>
          sender.send(new DatagramPacket(f, f.length,
            InetAddress.getLoopbackAddress, bridge.boundPort))
          Thread.sleep(1) // keep loopback arrival order == send order
        }
      } finally sender.close()

      val deadline = System.currentTimeMillis() + 15000
      while (bridge.packetsDecoded < frames.length &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(bridge.packetsDecoded === frames.length,
        s"only ${bridge.packetsDecoded}/${frames.length} datagrams decoded")

      val outDir = Files.createTempDirectory("udp-session")
      val path = outDir.resolve("log").toString
      val ckpt = outDir.resolve("ckpt").toString
      val q = StreamOps.recordSession(LiveMerge.merged(bridge.packets).toDF(), path, ckpt)
      try q.processAllAvailable() finally q.stop()

      val streamed = spark.read.parquet(path).collect()
        .map(r => (r.getAs[Double]("Timestamp"), r.getAs[Long]("Driver"),
          r.getAs[Int]("Speed"), r.getAs[Double]("Throttle"),
          r.getAs[Double]("Brake"), r.getAs[Int]("Gear"), r.getAs[Int]("RPM"),
          r.getAs[Double]("Distance"), r.getAs[Int]("LapNumber"))).toSet

      // batch reference: same frames, same deterministic clock sequence
      val clock2 = counterClock()
      val packets = frames.flatMap(f => decode(clock2(), f, 1L))
      val (expected, _) = processPackets(1L, packets.iterator,
        MergeState(None, None, NeverEmitted), DefaultThrottleUs)
      val expectedSet = expected.map(s => (s.Timestamp, s.Driver, s.Speed,
        s.Throttle, s.Brake, s.Gear, s.RPM, s.Distance, s.LapNumber)).toSet

      assert(expectedSet.nonEmpty)
      assert(streamed === expectedSet)
    } finally bridge.stop()
  }

  test("live inference hook scores the merged stream end-to-end") {
    // The reference's dormant AI-coaching edge
    // (F1-25_Telemetry_DB_Record.py:194-195): model predictions batched
    // per partition INSIDE the live stream, driven over a real socket.
    val frames = fixtureFrames(30)
    val bridge = new UdpBridge(spark, port = 0, driver = 1L, clock = counterClock())
    bridge.start()
    try {
      val sender = new DatagramSocket()
      try {
        frames.foreach { f =>
          sender.send(new DatagramPacket(f, f.length,
            InetAddress.getLoopbackAddress, bridge.boundPort))
          Thread.sleep(1)
        }
      } finally sender.close()
      val deadline = System.currentTimeMillis() + 15000
      while (bridge.packetsDecoded < frames.length &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(bridge.packetsDecoded === frames.length)

      val trackLen = 7004.0
      val scored = graft.ml.InferenceHook.withLivePredictions(
        LiveMerge.merged(bridge.packets).toDF(),
        graft.ml.InferenceHook.MeanSpeedStub, trackLen)
      val q = scored.writeStream.format("memory")
        .queryName("live_scored").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.sql("SELECT * FROM live_scored").collect()

      // batch reference from the same frames + clock
      val clock2 = counterClock()
      val packets = frames.flatMap(f => decode(clock2(), f, 1L))
      val (expected, _) = processPackets(1L, packets.iterator,
        MergeState(None, None, NeverEmitted), DefaultThrottleUs)
      assert(expected.nonEmpty)
      assert(rows.length === expected.size)
      // the stub predicts the mean of the window's speed feature; a
      // 1-step live window makes that exactly Speed/360 as float32
      rows.foreach { r =>
        val speed = r.getAs[Int]("Speed")
        val pred = r.getAs[Float]("prediction")
        assert(pred === (speed / 360.0).toFloat,
          s"speed $speed scored $pred")
      }
    } finally bridge.stop()
  }

  test("bridge drops malformed datagrams silently, keeps decoding") {
    val bridge = new UdpBridge(spark, port = 0, driver = 1L, clock = counterClock())
    bridge.start()
    try {
      val sender = new DatagramSocket()
      try {
        val junk = Array.fill[Byte](100)(42) // wrong size for any packet id
        val short = Array.fill[Byte](10)(1) // below the 24-byte guard
        val good = telemetryFrame(0, 300, 1.0f, 0.0f, 7, 12000)
        Seq(junk, short, good).foreach { f =>
          sender.send(new DatagramPacket(f, f.length,
            InetAddress.getLoopbackAddress, bridge.boundPort))
          Thread.sleep(5)
        }
      } finally sender.close()
      val deadline = System.currentTimeMillis() + 10000
      while (bridge.packetsDecoded < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(bridge.packetsDecoded === 1L)
    } finally bridge.stop()
  }
}
