package graft.text

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming face of the incremental substring dedup: a foreachBatch
  * loop that flags each micro-batch against the accumulated gram
  * index, then folds the batch's own grams into the index — the shape
  * a landing-zone dedup job runs daily.
  *
  * The invariant under test is the sequential form of the gate's
  * equivalence: with doc ids arriving in increasing order, the UNION of
  * per-batch incremental spans must equal `duplicatedSpans` of the
  * whole corpus computed in one shot — i.e. streaming ingestion loses
  * and invents nothing relative to a from-scratch batch recompute. */
class SubstringDedupStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val K = 10

  test("per-batch incremental spans union to the one-shot batch recompute") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("subdedup_stream").toString
    val indexDir = s"$dir/gram_index"
    val rnd = new scala.util.Random(29)
    def blob(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val boiler = blob(35)
    val all = (1L to 90L).map { i =>
      val body = blob(40 + rnd.nextInt(80))
      val t = if (i % 5 == 0) {
        val cut = rnd.nextInt(body.length)
        body.substring(0, cut) + boiler + body.substring(cut)
      } else body
      (i, t)
    }
    // three arrival waves, ids strictly increasing across waves
    val waves = all.grouped(30).toSeq

    val collected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val index =
          if (new java.io.File(indexDir).exists) s.read.parquet(indexDir)
          else s.range(0).select(col("id").as("gram"))
        collected ++= SubstringDedup
          .incrementalSpans(batch, index, expectedGrams = 100000L, k = K)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // fold this batch's grams into the persisted index AFTER
        // flagging — next wave sees this wave as history
        SubstringDedup.gramIndex(batch, K)
          .write.mode(SaveMode.Append).parquet(indexDir)
      }
      .start()
    try waves.foreach { w => input.addData(w: _*); q.processAllAvailable() }
    finally q.stop()

    val oneShot = SubstringDedup.duplicatedSpans(all.toDF("doc_id", "text"), K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(oneShot.nonEmpty)
    assert(collected.toSet === oneShot)
    // the index is the only cross-batch state, and it is content-bounded:
    // at most one row per distinct gram hash ever needs retaining
    val idx = spark.read.parquet(indexDir)
    assert(idx.distinct().count() <= all.map(_._2.length).sum)
  }
}
