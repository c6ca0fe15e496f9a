package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("chained increments equal a full recompute bit-for-bit") {
    import spark.implicits._
    val ev = Seq(
      (1L, 101L, 1.5), (2L, 101L, 2.25), (3L, 102L, -4.0),
      (4L, 101L, 0.125), (5L, 103L, 9.75), (6L, 102L, 4.0),
      (7L, 103L, 0.0), (8L, 104L, 7.5)
    ).toDF("event_id", "user_id", "value")
    // three increments in sequence: (s1 ⊕ d2) ⊕ d3 — associativity of
    // the decimal sum is what makes the incremental path exact
    val s1 = IncrementalAgg.partials(ev.filter(col("event_id") <= 3))
    val d2 = IncrementalAgg.partials(
      ev.filter(col("event_id") > 3 && col("event_id") <= 6))
    val d3 = IncrementalAgg.partials(ev.filter(col("event_id") > 6))
    val chained = IncrementalAgg.present(
      IncrementalAgg.merge(IncrementalAgg.merge(s1, d2), d3))
    val full = IncrementalAgg.present(IncrementalAgg.partials(ev))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
    assert(chained.collect().map(key).toSet === full.collect().map(key).toSet)
  }

  test("keys present in only one side survive the merge") {
    import spark.implicits._
    val a = IncrementalAgg.partials(
      Seq((1L, 1L, 2.0)).toDF("event_id", "user_id", "value"))
    val b = IncrementalAgg.partials(
      Seq((2L, 2L, 3.0)).toDF("event_id", "user_id", "value"))
    val m = IncrementalAgg.present(IncrementalAgg.merge(a, b)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m === Map(1L -> (1L, 2.0), 2L -> (1L, 3.0)))
  }
}
