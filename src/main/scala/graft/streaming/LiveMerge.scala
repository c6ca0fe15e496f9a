package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues,
  ValueState}
import PacketCodec.LivePacket

/** J5 stream-stream "latest state" merge + S10 write throttle
  * (F1-25_Telemetry_DB_Record.py:145-198), re-expressed as typed
  * stateful streaming: per driver, hold the latest telemetry snapshot
  * and the latest lap snapshot; whenever both are present and at least
  * `throttleUs` has passed since the last emit, emit the merged row.
  *
  * Parity notes (SURVEY §2.8): last-write-wins like the reference
  * (no event-time reordering); the 0.1 s throttle is measured on
  * packet timestamps rather than wall clock so replays are
  * deterministic; at-least-once emission; no dedup.
  *
  * Scale: state is O(1) per driver (two tiny snapshots + a watermark
  * timestamp), so state store size is bounded by driver cardinality,
  * not rate. 60 Hz × 22 cars is trivially within a single executor;
  * the same plan shards by driver key at fleet scale.
  */
object LiveMerge {

  case class TelSnapshot(speed: Int, throttle: Double, brake: Double,
      gear: Int, rpm: Int)
  case class LapSnapshot(distance: Double, lapNumber: Int)
  case class MergeState(tel: Option[TelSnapshot], lap: Option[LapSnapshot],
      lastEmitUs: Long)

  /** The merged live record (reference doc shape — :183-189). */
  case class LiveSample(
      Timestamp: Double, // epoch seconds, like the reference's time.time()
      Driver: Long,
      Speed: Int,
      Throttle: Double,
      Brake: Double,
      Gear: Int,
      RPM: Int,
      Distance: Double,
      LapNumber: Int)

  val DefaultThrottleUs: Long = 100000L // 0.1 s

  /** "Never emitted" sentinel — far enough from MinValue that the
    * `tsUs - lastEmitUs` throttle subtraction cannot overflow. */
  val NeverEmitted: Long = Long.MinValue / 2

  private def update(state: MergeState, p: LivePacket): MergeState =
    p.packetId match {
      case PacketCodec.PacketIdTelemetry =>
        state.copy(tel = Some(TelSnapshot(p.speed.get, p.throttle.get,
          p.brake.get, p.gear.get, p.rpm.get)))
      case PacketCodec.PacketIdLap =>
        state.copy(lap = Some(LapSnapshot(p.distance.get, p.lapNumber.get)))
      case _ => state
    }

  /** Pure per-group kernel, shared by the streaming and batch paths:
    * fold packets in timestamp order, emitting on the throttle edge. */
  def processPackets(driver: Long, packets: Iterator[LivePacket],
      init: MergeState, throttleUs: Long): (Seq[LiveSample], MergeState) = {
    var st = init
    val out = Seq.newBuilder[LiveSample]
    packets.foreach { p =>
      st = update(st, p)
      (st.tel, st.lap) match {
        case (Some(t), Some(l)) if p.tsUs - st.lastEmitUs > throttleUs =>
          out += LiveSample(p.tsUs / 1e6, driver, t.speed, t.throttle,
            t.brake, t.gear, t.rpm, l.distance, l.lapNumber)
          st = st.copy(lastEmitUs = p.tsUs)
        case _ => ()
      }
    }
    (out.result(), st)
  }

  /** Per-driver processor on the Spark 4 `transformWithState` API —
    * the production path the engine's streaming docs name for a
    * long-lived 100 TB ingest (off-heap RocksDB state, native TTL).
    * Packets within a micro-batch are sorted by (tsUs) to get
    * deterministic last-write-wins inside the batch.
    *
    * Buffer bound (skew audit, round 5): unlike a batch funnel over
    * full history, the toArray below holds ONE driver's packets for ONE
    * micro-batch — bounded by packet rate × trigger interval (60 Hz ×
    * 2 streams × a 1 s trigger ≈ 120 rows), not by stream history. A
    * key flooding faster than that is a denial-of-service on ingest,
    * not an operator-memory property; cap it upstream (rate-limit the
    * UDP bridge) rather than silently dropping packets here, since LWW
    * correctness needs the in-batch sort. */
  /** Shared per-batch state fold for both processor variants. */
  private def foldBatch(st: ValueState[MergeState], key: Long,
      rows: Iterator[LivePacket], throttleUs: Long): Iterator[LiveSample] = {
    val init0 = if (st.exists()) st.get() else MergeState(None, None, NeverEmitted)
    val (out, next) = processPackets(key,
      rows.toArray.sortBy(p => (p.tsUs, p.packetId)).iterator, init0, throttleUs)
    st.update(next)
    out.iterator
  }

  class MergeProcessor(throttleUs: Long, ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, LivePacket, LiveSample] {
    @transient private var st: ValueState[MergeState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MergeState]("merge",
        Encoders.product[MergeState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[LivePacket],
        tv: TimerValues): Iterator[LiveSample] = foldBatch(st, key, rows, throttleUs)
  }

  /** [[MergeProcessor]] plus WARM START: per-key state is seeded before
    * the first batch via transformWithState's initial-state channel —
    * the recorder-restart path (a new stream resumes against the last
    * PUBLISHED per-driver sample instead of re-pairing from nothing,
    * so the emit throttle carries across the restart too). */
  class MergeProcessorWithBootstrap(throttleUs: Long,
      ttl: Option[java.time.Duration])
      extends StatefulProcessorWithInitialState[Long, LivePacket, LiveSample,
        MergeState] {
    @transient private var st: ValueState[MergeState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MergeState]("merge",
        Encoders.product[MergeState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInitialState(key: Long, initial: MergeState,
        tv: TimerValues): Unit = st.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[LivePacket],
        tv: TimerValues): Iterator[LiveSample] = foldBatch(st, key, rows, throttleUs)
  }

  /** Streaming merge: groupByKey(driver).transformWithState (J5 on the
    * forward API; the pure kernel and the LWW/throttle semantics are
    * unchanged from the mapGroupsWithState era — the parity fixtures in
    * StreamingSpec prove it). `stateTtl` bounds state lifetime for
    * drivers that go silent: after expiry the snapshots are dropped, so
    * a lone lap packet no longer emits until a fresh telemetry packet
    * re-pairs it — O(active keys) state instead of O(ever-seen keys).
    *
    * transformWithState requires the RocksDB state store provider; set
    * it here (runtime conf, affects only queries started after) the
    * same way QueryDsl.events sets its decode flag. */
  def merged(packets: Dataset[LivePacket],
      throttleUs: Long = DefaultThrottleUs,
      stateTtl: Option[java.time.Duration] = None): Dataset[LiveSample] = {
    val spark = packets.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    packets
      .groupByKey(_.driver)
      .transformWithState(new MergeProcessor(throttleUs, stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Warm-started streaming merge: like [[merged]], but per-driver
    * state is seeded from `seed` before the first micro-batch. Parity
    * note: the seed carries the last PUBLISHED sample (what a recording
    * holds — the reference's restart sees only its persisted docs,
    * F1-25_Telemetry_DB_Record.py:163-189), so a restart is equivalent
    * to the continuous run whenever the cut happens on an emit
    * boundary; unpaired packets after the final pre-restart emit are
    * lost with the process, exactly as in the reference. */
  def mergedBootstrapped(packets: Dataset[LivePacket],
      seed: Dataset[(Long, MergeState)],
      throttleUs: Long = DefaultThrottleUs,
      stateTtl: Option[java.time.Duration] = None): Dataset[LiveSample] = {
    val spark = packets.sparkSession
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    packets
      .groupByKey(_.driver)
      .transformWithState(new MergeProcessorWithBootstrap(throttleUs, stateTtl),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append(),
        seed.groupByKey(_._1).mapValues(_._2))
  }

  /** Rebuild the per-driver merge state from a session recording
    * ([[StreamOps.recordSession]] output / the live emission log): the
    * latest sample per driver becomes the held telemetry+lap snapshots,
    * its timestamp the throttle floor. */
  def bootstrapFromRecording(recorded: org.apache.spark.sql.DataFrame)
      : Dataset[(Long, MergeState)] = {
    val spark = recorded.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max, struct}
    recorded.groupBy(col("Driver"))
      .agg(max(struct(col("Timestamp"), col("Speed"), col("Throttle"),
        col("Brake"), col("Gear"), col("RPM"), col("Distance"),
        col("LapNumber"))).as("_l"))
      .select(col("Driver").cast("long").as("_d"),
        col("_l.Timestamp"), col("_l.Speed"), col("_l.Throttle"),
        col("_l.Brake"), col("_l.Gear"), col("_l.RPM"), col("_l.Distance"),
        col("_l.LapNumber"))
      .as[(Long, Double, Int, Double, Double, Int, Int, Double, Int)]
      .map { case (d, ts, sp, th, br, g, rpm, dist, lap) =>
        // Timestamp is tsUs/1e6; rint round-trips the microsecond count
        // exactly for any epoch value < 2^53
        (d, MergeState(Some(TelSnapshot(sp, th, br, g, rpm)),
          Some(LapSnapshot(dist, lap)), math.rint(ts * 1e6).toLong))
      }
  }
}
