package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Offline state introspection — the ops story for a long-lived 100 TB
  * stateful stream: the `statestore` batch source reads a
  * transformWithState checkpoint back as a DataFrame, so "what does
  * the state of user X look like right now" is a QUERY against the
  * stopped (or snapshotted) checkpoint, not a debugger session or a
  * bespoke dump tool. State debugging/auditing at scale is exactly as
  * distributed as any other scan.
  */
class StateIntrospectionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("statestore source reads transformWithState state back as a queryable frame") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("state_introspect").toString
    val input = MemoryStream[(Long, Long)]
    val q = TwsOps.runningStats(input.toDS())
      .writeStream.format("memory").queryName("introspect_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, 10L), (2L, 5L))); q.processAllAvailable()
      input.addData(Seq((1L, 7L), (3L, -2L))); q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
    // offline: per-key state must equal the converged running totals
    val st = spark.read.format("statestore")
      .option("stateVarName", "stat")
      .load(ckpt)
      .select(col("key.value").as("user_id"),
        col("value.n").as("n"), col("value.sumQ").as("sum_q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(st === Set((1L, 2L, 17L), (2L, 1L, 5L), (3L, 1L, -2L)))
  }
}
