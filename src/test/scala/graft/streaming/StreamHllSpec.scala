package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamHllSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("converged streaming HLL estimates are BIT-equal to the batch kernel gate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    // fixture events sliced into three arbitrary micro-batches — the
    // register fold must be slicing-invariant
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batches = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
    val input = MemoryStream[(String, Long)]
    val q = StreamHll.distinctEstimates(
      input.toDS().toDF("event_type", "user_id"), "event_type", "user_id")
      .writeStream.format("memory").queryName("hll_stream_out")
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // converged emission per key = the one with the max n_seen
      val got = spark.table("hll_stream_out")
        .groupBy("grp")
        .agg(max(struct(col("n_seen"), col("zero_regs"), col("est_e6"))).as("m"))
        .select(col("grp"), col("m.zero_regs"), col("m.est_e6"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = StreamHll.distinctEstimatesBatch(
        rows.toDF("event_type", "user_id"), "event_type", "user_id")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === batch)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
