package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import PacketCodec._
import LiveMerge._

/** The FULL live pipeline composed once, as one streaming job:
  * recorded packet log → [[LiveMerge.merged]] (transformWithState,
  * RocksDB) → [[UpsertSink.maintain]] (latest live sample per driver)
  * → statestore introspection — with an injected crash-replay in the
  * middle. The pieces are each spec'd (UdpBridgeSpec, TwsOpsSpec,
  * UpsertSinkSpec, BenchSoakSpec); this is the missing chain witness:
  * merge state and sink commits recover TOGETHER, leaving the
  * maintained table byte-identical and the state store key-bounded.
  *
  * The packet log is produced through the REAL codec (frame builders →
  * decode, deterministic 50 Hz clock) for four drivers, split into
  * timestamp-ordered chunk files with pinned mtimes so the file source
  * replays them in a deterministic order at one file per trigger. */
class LivePipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val Drivers = Seq(1L, 2L, 3L, 4L)
  private val Chunks = 6
  private val PairsPerDriverPerChunk = 25

  /** Deterministic decoded packet log: per chunk, interleaved tel/lap
    * pairs for each driver on a shared 50 Hz clock. */
  private def packetLog(): Seq[(Int, LivePacket)] = {
    val tick = new AtomicLong(0)
    for {
      c <- 0 until Chunks
      i <- 0 until PairsPerDriverPerChunk
      d <- Drivers
      p <- {
        val k = c * PairsPerDriverPerChunk + i
        Seq(
          telemetryFrame(3, (200 + 3 * k + d.toInt) % 350, 0.75f, 0.5f,
            gear = (k % 8).toByte, rpm = 9000 + k),
          lapFrame(3, 10.0f * k, 1 + k / 40)
        ).flatMap(f => PacketCodec.decode(tick.addAndGet(20000L), f, d))
      }
    } yield (c, p)
  }

  test("bridge→merge→maintain→introspect: one job, crash-replay, identical table") {
    import spark.implicits._
    val prev = spark.conf.getOption(ProviderKey)
    val root = java.nio.file.Files.createTempDirectory("live_e2e").toString
    val src = s"$root/packets"; val table = s"$root/live_dim"
    val ckpt = s"$root/ckpt"
    new java.io.File(src).mkdirs()

    val log = packetLog()
    // one parquet FILE per chunk, mtime pinned so the stream replays
    // chunks in timestamp order (the recorder's arrival order)
    for (c <- 0 until Chunks) {
      val tmp = s"$root/tmp_$c"
      log.filter(_._1 == c).map(_._2).toDS().coalesce(1)
        .write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(src, f"chunk_$c%03d.parquet")
      assert(part.renameTo(dst))
      assert(dst.setLastModified(1000000L * (c + 1)))
    }

    def drain(): Unit = {
      val packets = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[LivePacket]].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .as[LivePacket]
      val merged = LiveMerge.merged(packets).toDF()
      val q = UpsertSink.maintain(spark, merged, table, ckpt, Seq("Driver"),
        orderCol = "Timestamp", availableNow = false)
      try q.processAllAvailable() finally q.stop()
    }

    def snapshot() = UpsertSink.read(spark, table).collect()
      .map(r => (r.getAs[Long]("Driver"), r.getAs[Double]("Timestamp"),
        r.getAs[Int]("Speed"), r.getAs[Double]("Throttle"),
        r.getAs[Double]("Brake"), r.getAs[Int]("Gear"), r.getAs[Int]("RPM"),
        r.getAs[Double]("Distance"), r.getAs[Int]("LapNumber"))).toSet

    try {
      spark.conf.set(ProviderKey, RocksDb)
      drain()
      val t1 = snapshot()

      // expected: the batch kernel over the full per-driver sequence;
      // the maintained row is the LAST emitted sample per driver
      val expected = Drivers.map { d =>
        val seq = log.map(_._2).filter(_.driver == d)
          .sortBy(p => (p.tsUs, p.packetId))
        val (out, _) = processPackets(d, seq.iterator,
          MergeState(None, None, NeverEmitted), DefaultThrottleUs)
        val s = out.last
        (s.Driver, s.Timestamp, s.Speed, s.Throttle, s.Brake, s.Gear,
          s.RPM, s.Distance, s.LapNumber)
      }.toSet
      assert(t1 === expected)

      // merge state is key-bounded: exactly one row per driver
      val stateRows = spark.read.format("statestore")
        .option("stateVarName", "merge").load(ckpt)
      assert(stateRows.count() === Drivers.size.toLong)

      // injected crash-replay: drop the newest commit marker (+ CRC
      // sibling) so the restart re-runs the final micro-batch with the
      // SAME batchId through BOTH the tws operator and the sink guard
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
      assert(commits.length >= Chunks) // really one trigger per chunk
      val crc = new java.io.File(s"$ckpt/commits",
        s".${commits.last.getName}.crc")
      assert(commits.last.delete())
      if (crc.exists) assert(crc.delete())
      drain()
      assert(snapshot() === t1, "replay must leave the table byte-identical")

      // and the state store did not grow through the replay
      val stateRows2 = spark.read.format("statestore")
        .option("stateVarName", "merge").load(ckpt)
      assert(stateRows2.count() === Drivers.size.toLong)

      // clean re-run with nothing new: full no-op
      drain()
      assert(snapshot() === t1)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
