package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import EwmaAlerts._

class EwmaAlertsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** real corpus events as the typed stream input, in event order */
  private def corpusEvents(): Seq[Event] = {
    val ev = graft.queries.QueryDsl.events(spark, sfDir)
    ev.select(col("user_id"), col("event_id"), col("ev_us"), col("value"))
      .collect()
      .map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(e => (e.ev_us, e.event_id))
  }

  test("in-order streamed scores equal the batch w_ewma gate bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = corpusEvents()
    val input = MemoryStream[Event]
    val q = EwmaAlerts.scored(input.toDS())
      .writeStream.format("memory").queryName("ewma_scored")
      .outputMode("append").start()
    try {
      // three in-order micro-batches spanning the full corpus
      val third = all.length / 3
      input.addData(all.take(third))
      q.processAllAvailable()
      input.addData(all.slice(third, 2 * third))
      q.processAllAvailable()
      input.addData(all.drop(2 * third))
      q.processAllAvailable()
      val streamed = spark.table("ewma_scored")
        .select(col("event_id"), round(col("ewma"), 6).as("ewma"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val batch = graft.SparkEntry.queries("w_ewma")(spark, sfDir)
        .select(col("event_id"), col("ewma"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed.size === batch.size)
      val mismatches = batch.collect {
        case (id, v) if streamed(id) != v => (id, v, streamed(id))
      }
      assert(mismatches.isEmpty,
        s"${mismatches.size} mismatches, e.g. ${mismatches.take(3)}")
    } finally q.stop()
  }

  test("alert flag fires on a spike and settles back") {
    val events = (1 to 10).map(i => Event(1L, i.toLong, i.toLong * 1000, 10.0)) ++
      Seq(Event(1L, 11L, 11000L, 100.0)) ++
      (12 to 20).map(i => Event(1L, i.toLong, i.toLong * 1000, 10.0))
    val (_, scored) = foldBatch(Recent(Nil), events, alertFactor = 1.5)
    val alerts = scored.filter(_.alert).map(_.event_id)
    assert(alerts === Seq(11L)) // only the spike: later 10s sit below 1.5×ewma
  }

  test("EWMA state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ewma_ckpt").toString
    val input = MemoryStream[Event]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Scored]()
    def start() = EwmaAlerts.scored(input.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Scored], _: Long) =>
        batch.collect().foreach(sink.add) }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val warmup = (1 to 7).map(i => Event(1L, i.toLong, i.toLong * 1000, 10.0))
    val q1 = start()
    try {
      input.addData(warmup)
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: the recovered 7-value history must make the next score
    // a FULL-depth ewma, identical to an uninterrupted fold
    val q2 = start()
    try {
      input.addData(Event(1L, 8L, 8000L, 90.0))
      q2.processAllAvailable()
      val restarted = sink.toArray(Array.empty[Scored]).find(_.event_id == 8L).get
      val (_, unbroken) = foldBatch(Recent(Nil),
        warmup :+ Event(1L, 8L, 8000L, 90.0), alertFactor = 1.5)
      assert(restarted.ewma === unbroken.last.ewma)
      assert(restarted.alert === unbroken.last.alert)
    } finally q2.stop()
  }

  test("state is bounded at Depth-1 values regardless of history length") {
    val events = (1 to 1000).map(i =>
      Event(1L, i.toLong, i.toLong * 1000, i.toDouble))
    val (state, _) = foldBatch(Recent(Nil), events, alertFactor = 1.5)
    assert(state.values.length === Depth - 1)
  }
}
