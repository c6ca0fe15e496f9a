package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, SocketException}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import PacketCodec.LivePacket

/** The live ingestion bridge: a real UDP socket → `Dataset[LivePacket]`
  * stream, the piece that turns the reference's 60 Hz recorder loop
  * (F1-25_Telemetry_DB_Record.py:139-191 — bind, poll, decode, stamp)
  * into a Structured Streaming source. Datagrams are received on a
  * daemon thread, stamped by the injectable `clock` (wall-clock micros
  * by default; a deterministic counter in replay tests), decoded by
  * [[PacketCodec]] (short/foreign frames silently dropped, like the
  * reference), and pushed into the stream. Downstream is the normal
  * pipeline: [[LiveMerge.merged]] → [[StreamOps.recordSession]].
  *
  * The in-memory buffer is the single-process form; at fleet scale the
  * same decode+merge plan runs unchanged behind a durable bus source
  * (Kafka/Kinesis) — the bridge is the documented seam, the query is
  * identical. State downstream is O(drivers), so one 22-car session is
  * trivially one executor; sharding is by the driver key. */
class UdpBridge(spark: SparkSession, port: Int = 0, driver: Long = 1L,
    clock: () => Long = () => System.currentTimeMillis() * 1000L) {

  private implicit val sqlCtx: SQLContext = spark.sqlContext
  private implicit val enc: org.apache.spark.sql.Encoder[LivePacket] =
    org.apache.spark.sql.Encoders.product[LivePacket]
  private val stream = MemoryStream[LivePacket]
  private val socket = new DatagramSocket(port)
  socket.setReceiveBufferSize(1 << 20)
  @volatile private var running = false
  private val decoded = new AtomicLong(0)
  private val errors = new AtomicLong(0)
  private var thread: Thread = _
  private val MaxConsecutiveErrors = 1000

  /** False once stop() was called or the bridge gave up after
    * MaxConsecutiveErrors straight receive failures. */
  def isRunning: Boolean = running

  /** Actual bound port (pass port 0 for an ephemeral one). */
  def boundPort: Int = socket.getLocalPort

  /** The live packet stream — feed to [[LiveMerge.merged]]. */
  def packets: Dataset[LivePacket] = stream.toDS()

  /** Packets successfully decoded so far (dropped frames not counted). */
  def packetsDecoded: Long = decoded.get()

  /** Receive/decode errors survived so far (the loop keeps running). */
  def receiveErrors: Long = errors.get()

  def start(): Unit = {
    require(thread == null, "bridge already started")
    running = true
    thread = new Thread(() => {
      val buf = new Array[Byte](4096)
      // A persistent socket failure (closed/broken outside stop())
      // must not busy-spin at full CPU: back off on consecutive
      // errors and give up once the socket is clearly dead. A single
      // successful receive resets the streak.
      var consecutive = 0
      while (running && consecutive < MaxConsecutiveErrors) {
        val dg = new DatagramPacket(buf, buf.length)
        try {
          socket.receive(dg)
          // a successful receive proves the SOCKET is healthy — reset
          // the give-up counter before decoding, so a burst of
          // malformed frames (a decode problem, not a socket problem)
          // can never stop ingestion or back it off
          consecutive = 0
          try {
            val bytes = java.util.Arrays.copyOf(dg.getData, dg.getLength)
            PacketCodec.decode(clock(), bytes, driver).foreach { p =>
              stream.addData(p)
              decoded.incrementAndGet()
            }
          } catch {
            case scala.util.control.NonFatal(e) =>
              // bad frame: count it, log once in a while, keep going
              // at full speed (the reference drops malformed frames
              // silently; we at least count them)
              val n = errors.incrementAndGet()
              if (n == 1 || n % 1000 == 0) {
                System.err.println(
                  s"udp-bridge-$boundPort: survived decode error #$n: $e")
              }
          }
        } catch {
          case _: SocketException if !running => () // closed by stop()
          case scala.util.control.NonFatal(e) =>
            // a RECEIVE failure: transient ones are survived with a
            // short backoff; a persistently broken socket (closed or
            // broken outside stop()) stops the bridge after
            // MaxConsecutiveErrors instead of busy-spinning forever
            val n = errors.incrementAndGet()
            consecutive += 1
            if (n == 1 || n % 1000 == 0 ||
                consecutive == MaxConsecutiveErrors) {
              System.err.println(
                s"udp-bridge-$boundPort: survived receive error #$n: $e" +
                  (if (consecutive == MaxConsecutiveErrors)
                    s" — $consecutive consecutive failures, stopping bridge"
                  else ""))
            }
            // the backoff sleep is interruptible: an interrupt is a
            // shutdown signal, not a survivable error — restore the
            // flag and stop the loop so isRunning reports the truth
            // (NonFatal does not catch InterruptedException, so an
            // uncaught one would kill the thread with running=true)
            try Thread.sleep(math.min(200L, 2L * consecutive))
            catch {
              case _: InterruptedException =>
                Thread.currentThread().interrupt()
                running = false
            }
        }
      }
      if (consecutive >= MaxConsecutiveErrors) running = false
    }, s"udp-bridge-$boundPort")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = {
    running = false
    socket.close()
    if (thread != null) thread.join(2000)
  }
}
