package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import StreamCdc._

class StreamCdcSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def reconstruct(rows: Seq[SnapshotRow]): Map[Long, Double] =
    rows.groupBy(_.user_id)
      .map { case (u, rs) => u -> rs.maxBy(_.updated_us) }
      .collect { case (u, r) if !r.deleted => u -> r.value }

  test("3-batch replay with deletes, resurrect, and stale arrivals = batch CDC") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamCdc.snapshot(input.toDS())
      .writeStream.format("memory").queryName("cdc_snap")
      .outputMode("append").start()
    try {
      // batch 1: inserts
      input.addData(
        Change(1L, 10L, 1L, "I", 1.0), Change(2L, 10L, 2L, "I", 2.0),
        Change(3L, 10L, 3L, "I", 3.0))
      q.processAllAvailable()
      // batch 2: update u1, delete u2, delete-then... u3 gets D at 20
      input.addData(
        Change(1L, 20L, 4L, "U", 1.5), Change(2L, 20L, 5L, "D", 0.0),
        Change(3L, 20L, 6L, "D", 0.0))
      q.processAllAvailable()
      // batch 3: resurrect u3; STALE update for u1 (us=15 < 20) must
      // be ignored; u4 delete of a never-seen key is a no-op tombstone
      input.addData(
        Change(3L, 30L, 7L, "I", 9.0), Change(1L, 15L, 8L, "U", 777.0),
        Change(4L, 30L, 9L, "D", 0.0))
      q.processAllAvailable()

      val emitted = spark.table("cdc_snap").as[SnapshotRow].collect().toSeq
      val streamed = reconstruct(emitted)
      assert(streamed === Map(1L -> 1.5, 3L -> 9.0))

      // batch-path equivalence over the union of all changes
      val all = Seq(
        (1L, 10L, 1L, "I", 1.0), (2L, 10L, 2L, "I", 2.0),
        (3L, 10L, 3L, "I", 3.0), (1L, 20L, 4L, "U", 1.5),
        (2L, 20L, 5L, "D", 0.0), (3L, 20L, 6L, "D", 0.0),
        (3L, 30L, 7L, "I", 9.0), (1L, 15L, 8L, "U", 777.0),
        (4L, 30L, 9L, "D", 0.0))
        .toDF("user_id", "ev_us", "event_id", "op", "value")
      val batch = graft.ops.Cdc.applyChangelog(all).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("cdc_ckpt").toString
    val input = MemoryStream[Change]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[SnapshotRow]()
    // memory sinks cannot recover from a checkpoint; foreachBatch can
    def start() = StreamCdc.snapshot(input.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SnapshotRow],
          _: Long) => batch.collect().foreach(sink.add) }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      input.addData(Change(1L, 10L, 1L, "I", 4.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the same checkpoint: the held state for user 1
    // must still be there, so a stale change arriving AFTER the
    // restart is rejected against it
    val q2 = start()
    try {
      input.addData(Change(1L, 5L, 2L, "U", 99.0)) // stale vs us=10
      q2.processAllAvailable()
      val rows = sink.toArray(Array.empty[SnapshotRow])
      assert(rows.nonEmpty)
      val last = rows.maxBy(_.updated_us)
      assert(last.value === 4.0 && last.updated_us === 10L && !last.deleted)
    } finally q2.stop()
  }

  test("kernel: stale change never overwrites; equal-us ties on event_id") {
    val s0 = foldChanges(None, Seq(Change(1L, 10L, 5L, "I", 1.0)))
    assert(s0 === Some(KeyState(1.0, 10L, 5L)))
    // stale (us 5) ignored; tie us=10 with higher event_id wins
    val s1 = foldChanges(s0, Seq(
      Change(1L, 5L, 9L, "U", 50.0), Change(1L, 10L, 7L, "U", 2.0)))
    assert(s1 === Some(KeyState(2.0, 10L, 7L)))
    // tie us with LOWER event_id is stale too
    val s2 = foldChanges(s1, Seq(Change(1L, 10L, 6L, "D", 0.0)))
    assert(s2 === Some(KeyState(2.0, 10L, 7L)))
  }
}
