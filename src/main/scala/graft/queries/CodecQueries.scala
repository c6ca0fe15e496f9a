package graft.queries

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.streaming.{LiveMerge, PacketCodec}
import QueryDsl._

/** Flat decoded frame for the S9 roundtrip gate (options collapsed to
  * zero-defaults; the per-packet-id grouping keeps the two channel
  * groups separate, so the defaults never mix into the wrong sums). */
case class CodecRow(
    packet_id: Int, speed: Int, throttle: Double, brake: Double,
    gear: Int, rpm: Int, distance: Double, lap_number: Int, us: Long)

/** CORRECTNESS gate for the S9 UDP-datagram decode seam
  * (F1-25_Telemetry_DB_Record.py:38-135 struct layout, :156/:163/:175
  * silent-skip guards) — the last §2 row that carried only ScalaTest
  * evidence.
  *
  * The binary layer has no DuckDB spelling, so the gate closes the loop
  * through it instead: every events row is deterministically rendered
  * into a REAL full-size frame (1352-byte id-6 telemetry / 1284-byte
  * id-2 lap data, player index varying over all 22 car slots) with
  * [[PacketCodec]]'s frame builders, decoded back with the production
  * [[PacketCodec.decode]], and aggregated; the oracle re-derives the
  * same channels from `events` in pure SQL. A hash match proves
  * decode ∘ encode = id through the full packed-struct layout — offsets,
  * little-endianness, the ×100 throttle/brake normalization, the
  * unsigned-short and signed-byte reads — not just that Spark round-trips
  * its own rows.
  *
  * Corruption is injected on two residue classes and must be DROPPED for
  * the hash to match (the oracle excludes those rows): `k%101==0` → a
  * 10-byte truncated datagram (short-frame guard), `k%103==0` → a
  * header-only frame with foreign packet id 4 (packet-id dispatch guard).
  *
  * Oracle-exactness: every encoded float is exactly representable
  * (quarter/half fractions, integers < 2^24), so the float→double ×100
  * path is bit-deterministic; all sums are integer-valued doubles far
  * below 2^53 → order-immune.
  *
  * Scale shape: one narrow mapPartitions (encode+decode fused, zero
  * shuffle of the binary payloads) into a 2-group hash aggregate.
  */
object CodecQueries {

  /** Header-only frame with an arbitrary (foreign) packet id — length
    * passes the MinFrameSize guard, the id dispatch must reject it. */
  private def foreignFrame(packetId: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(PacketCodec.HeaderSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0, 2025.toShort)
    b.put(5, packetId.toByte)
    b.put(27, 0.toByte)
    b.array()
  }

  private val s9Roundtrip: Q = (s, d) => {
    import s.implicits._
    val src = events(s, d).select(col("ev_us"), col("event_id"))
      .as[(Long, Long)]
    val decoded = src.mapPartitions { it =>
      it.flatMap { case (us, k) =>
        val bytes: Array[Byte] =
          if (k % 101 == 0) Array.fill(10)((k % 256).toByte) // truncated
          else if (k % 103 == 0) foreignFrame(4)             // foreign id
          else if (k % 2 == 0)
            PacketCodec.telemetryFrame(
              playerIdx = (k % 22).toInt,
              speed = (k % 350).toInt,
              throttle01 = (k % 5).toFloat * 0.25f,
              brake01 = (k % 3).toFloat * 0.5f,
              gear = (k % 10 - 1).toByte,
              rpm = (k % 15000).toInt)
          else
            PacketCodec.lapFrame(
              playerIdx = (k % 22).toInt,
              lapDistance = (k % 7000).toFloat,
              lapNumber = (k % 256).toInt)
        PacketCodec.decode(us, bytes).map { p =>
          CodecRow(p.packetId,
            p.speed.getOrElse(0), p.throttle.getOrElse(0.0),
            p.brake.getOrElse(0.0), p.gear.getOrElse(0),
            p.rpm.getOrElse(0), p.distance.getOrElse(0.0),
            p.lapNumber.getOrElse(0), p.tsUs)
        }
      }
    }
    decoded.toDF()
      .groupBy(col("packet_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("speed")).as("sum_speed"),
        sum(col("throttle")).as("sum_throttle"),
        sum(col("brake")).as("sum_brake"),
        sum(col("gear")).as("sum_gear"),
        sum(col("rpm")).as("sum_rpm"),
        sum(col("distance")).as("sum_distance"),
        sum(col("lap_number")).as("sum_lap"),
        min(col("us")).as("min_us"),
        max(col("us")).as("max_us"))
  }

  private val s9RoundtripSql =
    s"""WITH src AS (
       |  SELECT event_id AS k, $evUsSql AS us FROM events
       |  WHERE event_id % 101 <> 0 AND event_id % 103 <> 0),
       |r AS (
       |  SELECT CASE WHEN k % 2 = 0 THEN 6 ELSE 2 END AS packet_id,
       |    CASE WHEN k % 2 = 0 THEN k % 350 ELSE 0 END AS speed,
       |    CASE WHEN k % 2 = 0 THEN (k % 5) * 25.0 ELSE 0.0 END AS throttle,
       |    CASE WHEN k % 2 = 0 THEN (k % 3) * 50.0 ELSE 0.0 END AS brake,
       |    CASE WHEN k % 2 = 0 THEN k % 10 - 1 ELSE 0 END AS gear,
       |    CASE WHEN k % 2 = 0 THEN k % 15000 ELSE 0 END AS rpm,
       |    CASE WHEN k % 2 = 1 THEN CAST(k % 7000 AS DOUBLE) ELSE 0.0 END AS distance,
       |    CASE WHEN k % 2 = 1 THEN k % 256 ELSE 0 END AS lap_number,
       |    us
       |  FROM src)
       |SELECT CAST(packet_id AS INT) AS packet_id, COUNT(*) AS n,
       |  CAST(SUM(speed) AS BIGINT) AS sum_speed,
       |  SUM(throttle) AS sum_throttle,
       |  SUM(brake) AS sum_brake,
       |  CAST(SUM(gear) AS BIGINT) AS sum_gear,
       |  CAST(SUM(rpm) AS BIGINT) AS sum_rpm,
       |  SUM(distance) AS sum_distance,
       |  CAST(SUM(lap_number) AS BIGINT) AS sum_lap,
       |  MIN(us) AS min_us, MAX(us) AS max_us
       |FROM r GROUP BY 1""".stripMargin

  /** CORRECTNESS gate for the S10 write throttle
    * (F1-25_Telemetry_DB_Record.py:183-191: `if time.time() -
    * last_update_time >= update_interval` before each doc write) —
    * the last oracle-able §2 row that carried only ScalaTest evidence.
    *
    * The throttle is measured on PACKET timestamps (LiveMerge.scala
    * parity note), which makes the emission chain deterministic and
    * therefore gateable. The fixture gives each of 24 drivers a
    * REGULAR packet cadence δ = (driver%8+1)·25 ms, alternating
    * telemetry/lap frames, with per-packet channel values derived from
    * the packet index. Under a regular cadence the stateful fold has a
    * CLOSED FORM the oracle derives independently in pure SQL: pairing
    * completes at packet 2 (first emit), and after an emit at packet e
    * the next emit is the first i with (i−e)·δ > T, i.e. every
    * s = ⌊T/δ⌋+1 packets — so emitted i ⇔ i ≥ 2 ∧ (i−2) mod s = 0,
    * and the emitted Speed/… (Distance/…) channels are the LATEST
    * telemetry (lap) packet at or before i: i rounded down to
    * odd (even). A hash match proves the throttle edge (δ = 100 ms
    * drivers pin the STRICT `>` — exactly-T gaps must NOT emit), the
    * pairing gate (packet 1 must not emit), last-write-wins snapshot
    * state, and the sample-and-hold merge, against an oracle that
    * never runs the fold.
    *
    * The Spark side runs the PRODUCTION kernel — [[LiveMerge
    * .processPackets]], the exact fold `transformWithState` executes
    * per micro-batch (foldBatch delegates to it) — over a
    * groupByKey(driver) in batch, from a cold MergeState. Exactness:
    * timestamps are exact-integer micros with one IEEE divide by 1e6
    * (the LiveSample face); throttle/brake are quarter/half fractions
    * ×100; everything else is integer.
    *
    * Scale shape: one shuffle on driver (the same key the streaming
    * path shards state by), rank + fold per group, no driver-side
    * anything. */
  private val s10Throttle: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val throttleUs = LiveMerge.DefaultThrottleUs // 100 ms
    events(s, d).select(col("event_id"))
      .withColumn("driver", col("event_id") % 24)
      .withColumn("i",
        row_number().over(Window.partitionBy(col("driver"))
          .orderBy(col("event_id"))))
      .select(col("driver"), col("i"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (dr, rows) =>
        val deltaUs = (dr % 8 + 1) * 25000L
        val packets = rows.map(_._2).toArray.sorted.iterator.map { i =>
          val ts = i * deltaUs
          if (i % 2 == 1)
            PacketCodec.LivePacket(ts, dr, PacketCodec.PacketIdTelemetry,
              speed = Some(i % 350), throttle = Some((i % 5) * 25.0),
              brake = Some((i % 3) * 50.0), gear = Some(i % 10 - 1),
              rpm = Some(i % 15000), distance = None, lapNumber = None)
          else
            PacketCodec.LivePacket(ts, dr, PacketCodec.PacketIdLap,
              speed = None, throttle = None, brake = None, gear = None,
              rpm = None, distance = Some((i % 7000).toDouble),
              lapNumber = Some(i % 256))
        }
        val (out, _) = LiveMerge.processPackets(dr, packets,
          LiveMerge.MergeState(None, None, LiveMerge.NeverEmitted), throttleUs)
        out.iterator
      }
      .toDF()
      .select(col("Driver").as("driver"), col("Timestamp").as("t_sec"),
        col("Speed").as("speed"), col("Throttle").as("throttle"),
        col("Brake").as("brake"), col("Gear").as("gear"),
        col("RPM").as("rpm"), col("Distance").as("distance"),
        col("LapNumber").as("lap_number"))
  }

  private val s10ThrottleSql =
    """WITH src AS (
      |  SELECT event_id % 24 AS driver,
      |    CAST(row_number() OVER (PARTITION BY event_id % 24
      |         ORDER BY event_id) AS BIGINT) AS i
      |  FROM events),
      |p AS (
      |  SELECT driver, i, ((driver % 8) + 1) * 25000 AS delta
      |  FROM src),
      |em AS (
      |  SELECT driver, i, delta,
      |    CASE WHEN i % 2 = 1 THEN i ELSE i - 1 END AS tel_i,
      |    CASE WHEN i % 2 = 0 THEN i ELSE i - 1 END AS lap_i
      |  FROM p
      |  WHERE i >= 2
      |    AND (i - 2) % (100000 // delta + 1) = 0)
      |SELECT driver,
      |  CAST(i * delta AS DOUBLE) / 1000000.0 AS t_sec,
      |  CAST(tel_i % 350 AS INT) AS speed,
      |  (tel_i % 5) * 25.0 AS throttle,
      |  (tel_i % 3) * 50.0 AS brake,
      |  CAST(tel_i % 10 - 1 AS INT) AS gear,
      |  CAST(tel_i % 15000 AS INT) AS rpm,
      |  CAST(lap_i % 7000 AS DOUBLE) AS distance,
      |  CAST(lap_i % 256 AS INT) AS lap_number
      |FROM em""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("s9_codec_roundtrip", s9Roundtrip, Some(s9RoundtripSql)),
    ("s10_throttled_sink", s10Throttle, Some(s10ThrottleSql)))
}
