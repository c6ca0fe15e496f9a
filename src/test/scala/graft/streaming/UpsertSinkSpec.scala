package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("streaming upsert maintains latest-per-key and replays are no-ops") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("upsert").toString
    val table = s"$root/dim"

    def drain(feed: Seq[Seq[(Long, String, Long)]], checkpoint: String): Unit = {
      val input = MemoryStream[(Long, String, Long)]
      val q = UpsertSink.maintain(spark,
        input.toDS().toDF("k", "name", "version"), table, checkpoint, Seq("k"),
        availableNow = false)
      try feed.foreach { b => input.addData(b); q.processAllAvailable() }
      finally q.stop()
    }

    // one run, three micro-batches: key 2 upserted twice across
    // batches (and twice WITHIN batch 1, where version 5 must win);
    // untouched keys survive each merge
    drain(Seq(
      Seq((1L, "a", 1L), (2L, "b", 1L), (2L, "b2", 5L)),
      Seq((3L, "c", 1L)),
      Seq((2L, "b3", 9L), (4L, "d", 1L))), s"$root/ckpt")
    val t1 = spark.read.parquet(s"$table/current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(t1 === Set((1L, "a", 1L), (2L, "b3", 9L), (3L, "c", 1L), (4L, "d", 1L)))

    // crash-replay simulation: a FRESH checkpoint restarts batch ids
    // at 0, but the table has committed batch 2 — every replayed batch
    // is skipped by the committed-batch guard, table byte-identical
    drain(Seq(Seq((1L, "STALE", 99L)), Seq((2L, "STALE", 99L))), s"$root/ckpt2")
    val t2 = spark.read.parquet(s"$table/current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(t2 === t1)

    // a genuinely NEW batch id: three stale filler batches burn ids
    // 0-2 (all guarded), then batch 3 > committed 2 applies
    drain(Seq(Seq((1L, "STALE", 99L)), Seq((1L, "STALE", 99L)),
      Seq((1L, "STALE", 99L)), Seq((5L, "e", 1L))), s"$root/ckpt3")
    val t3 = spark.read.parquet(s"$table/current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(t3 === t1 + ((5L, "e", 1L)))
  }
}
