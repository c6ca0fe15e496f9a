package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TwsOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("transformWithState running stats over a multi-batch replay equals the batch aggregate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val input = MemoryStream[(Long, Long)]
    val q = TwsOps.runningStats(input.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    // three micro-batches; user 1 appears in all, user 2 in two,
    // user 3 once — exercises state carry across batch boundaries
    val feed = Seq(
      Seq((1L, 10L), (2L, 5L), (1L, -3L)),
      Seq((1L, 7L), (3L, 100L)),
      Seq((2L, 2L), (1L, 1L)))
    try {
      feed.foreach { b => input.addData(b); q.processAllAvailable() }
      // last emission per user = converged running state
      val got = spark.table("tws_out")
        .groupBy("user_id")
        .agg(max(struct(col("n"), col("sum_q"))).as("m"))
        .select(col("user_id"), col("m.n"), col("m.sum_q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val expect = feed.flatten.groupBy(_._1).map { case (u, rows) =>
        (u, rows.size.toLong, rows.map(_._2).sum)
      }.toSet
      assert(got === expect)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("batch gate form: micro-unit integerization is a plain exact aggregate") {
    import spark.implicits._
    val events = Seq((1L, 1.25), (1L, 2.5), (2L, -0.75))
      .toDF("user_id", "value")
    val got = TwsOps.runningStatsBatch(events)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 3750000L), (2L, 1L, -750000L)))
  }
}
