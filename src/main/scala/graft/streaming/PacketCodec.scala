package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}

/** Binary codec for the F1-25 game's UDP telemetry frames
  * (little-endian packed C structs, layout mirrored from
  * F1-25_Telemetry_DB_Record.py:38-135).
  *
  * Only the channels the reference consumes are decoded (player car's
  * speed/throttle/brake/gear/rpm from packet id 6; lap distance/number
  * from packet id 2); the full struct sizes are honored so real frames
  * parse. Frames shorter than the header (24 bytes in the reference's
  * guard) or with unexpected length are dropped, mirroring the
  * reference's silent-skip (:156, :163, :175).
  */
object PacketCodec {

  val HeaderSize = 29
  val CarTelemetrySize = 60
  val LapDataSize = 57
  val CarsPerPacket = 22
  val TelemetryPacketSize: Int = HeaderSize + CarsPerPacket * CarTelemetrySize + 3 // 1352
  val LapPacketSize: Int = HeaderSize + CarsPerPacket * LapDataSize + 2 // 1284
  val MinFrameSize = 24

  val PacketIdTelemetry = 6
  val PacketIdLap = 2

  /** One decoded packet, normalized to the reference's units
    * (Throttle/Brake ×100 — :165-166). Exactly one of the two channel
    * groups is populated, by packet id. */
  case class LivePacket(
      tsUs: Long,          // receive timestamp, epoch micros
      driver: Long,        // player car id (reference hardcodes 1 — :186)
      packetId: Int,
      speed: Option[Int],
      throttle: Option[Double],
      brake: Option[Double],
      gear: Option[Int],
      rpm: Option[Int],
      distance: Option[Double],
      lapNumber: Option[Int])

  private def buf(bytes: Array[Byte]) =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  /** Decode one datagram; None for short/foreign/odd-sized frames. */
  def decode(tsUs: Long, bytes: Array[Byte], driver: Long = 1L): Option[LivePacket] = {
    if (bytes == null || bytes.length < MinFrameSize) return None
    val b = buf(bytes)
    val packetId = b.get(5) & 0xff
    val playerIdx = b.get(27) & 0xff
    packetId match {
      case PacketIdTelemetry if bytes.length == TelemetryPacketSize =>
        val base = HeaderSize + playerIdx * CarTelemetrySize
        Some(LivePacket(tsUs, driver, packetId,
          speed = Some(b.getShort(base) & 0xffff),
          throttle = Some(b.getFloat(base + 2).toDouble * 100),
          brake = Some(b.getFloat(base + 10).toDouble * 100),
          gear = Some(b.get(base + 15).toInt),
          rpm = Some(b.getShort(base + 16) & 0xffff),
          distance = None, lapNumber = None))
      case PacketIdLap if bytes.length == LapPacketSize =>
        val base = HeaderSize + playerIdx * LapDataSize
        Some(LivePacket(tsUs, driver, packetId,
          speed = None, throttle = None, brake = None, gear = None, rpm = None,
          distance = Some(b.getFloat(base + 20).toDouble),
          lapNumber = Some(b.get(base + 33) & 0xff)))
      case _ => None
    }
  }

  // --- frame builders (fixtures/replay; the inverse of decode) ---

  private def header(packetId: Int, playerIdx: Int, sessionTime: Float): ByteBuffer = {
    val b = ByteBuffer.allocate(HeaderSize).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0, 2025.toShort) // packet format
    b.put(2, 25.toByte); b.put(3, 1.toByte); b.put(4, 1.toByte)
    b.put(5, packetId.toByte)
    b.putLong(6, 0x1234L)
    b.putFloat(14, sessionTime)
    b.putInt(18, 0); b.putInt(22, 0)
    b.put(27, playerIdx.toByte); b.put(28, 255.toByte)
    b
  }

  /** Build a telemetry (id 6) frame with the player car's channels. */
  def telemetryFrame(playerIdx: Int, speed: Int, throttle01: Float,
      brake01: Float, gear: Byte, rpm: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(TelemetryPacketSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put(header(PacketIdTelemetry, playerIdx, 0f).array())
    val base = HeaderSize + playerIdx * CarTelemetrySize
    out.putShort(base, speed.toShort)
    out.putFloat(base + 2, throttle01)
    out.putFloat(base + 10, brake01)
    out.put(base + 15, gear)
    out.putShort(base + 16, rpm.toShort)
    out.array()
  }

  /** Build a lap-data (id 2) frame with the player car's channels. */
  def lapFrame(playerIdx: Int, lapDistance: Float, lapNumber: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(LapPacketSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put(header(PacketIdLap, playerIdx, 0f).array())
    val base = HeaderSize + playerIdx * LapDataSize
    out.putFloat(base + 20, lapDistance)
    out.put(base + 33, lapNumber.toByte)
    out.array()
  }
}
