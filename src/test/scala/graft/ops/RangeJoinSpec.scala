package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def frames() = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val points = orders.select(col("o_orderkey"), col("o_orderdate"))
    val intervals = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 31 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        expr("timestampadd(DAY, 45, l_shipdate)").as("l_shipend"))
    (points, intervals)
  }

  test("binned range join equals the naive non-equi join") {
    val (points, intervals) = frames()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2))
    val naive = points.join(intervals,
        col("o_orderdate") >= col("l_shipdate") &&
          col("o_orderdate") <= col("l_shipend"))
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(key).toSeq.sorted
    val binned = RangeJoin.binned(points, col("o_orderdate"), intervals,
        col("l_shipdate"), col("l_shipend"), RangeJoin.timestampBins(32))
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(key).toSeq.sorted
    assert(naive.nonEmpty)
    assert(binned === naive)
  }

  test("binned plan is an equi-join, not a nested loop") {
    val (points, intervals) = frames()
    val naivePlan = points.join(intervals,
        col("o_orderdate") >= col("l_shipdate") &&
          col("o_orderdate") <= col("l_shipend"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin")) // what we avoid
    val binnedPlan = RangeJoin.binned(points, col("o_orderdate"), intervals,
        col("l_shipdate"), col("l_shipend"), RangeJoin.timestampBins(32))
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"))
    assert(!binnedPlan.contains("CartesianProduct"))
  }

  test("intervals spanning many bins and points on bin edges join exactly once") {
    import spark.implicits._
    // point exactly on lo, on hi, and a 5-bin-wide interval
    val points = Seq((1L, 0L), (2L, 100L), (3L, 500L), (4L, 501L))
      .toDF("pid", "v")
    val intervals = Seq((10L, 0L, 100L), (11L, 100L, 500L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, col("v"), intervals, col("lo"),
        col("hi"), c => floor(c / 100).cast("long"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("inverted interval (lo > hi) matches nothing — not a descending bin explosion") {
    import spark.implicits._
    val points = Seq((1L, 50L)).toDF("pid", "v")
    // an inverted sentinel interval: a bare sequence(bin(lo), bin(hi))
    // would DESCEND through 10^7 bins here; the guard must emit zero
    val intervals = Seq((10L, 1000000000L, 0L), (11L, 0L, 100L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, col("v"), intervals, col("lo"),
        col("hi"), c => floor(c / 100).cast("long"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 11L)))
  }

  test("interval spanning more than maxBins bins fails with a clear error") {
    import spark.implicits._
    val points = Seq((1L, 50L)).toDF("pid", "v")
    val intervals = Seq((10L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.binned(points, col("v"), intervals, col("lo"), col("hi"),
        c => floor(c / 100).cast("long"), maxBins = 1000L).collect()
    }
    assert(ex.getMessage.contains("maxBins"), ex.getMessage)
  }

  test("binned overlap join equals the naive overlap join, each pair exactly once") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 31 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        expr("timestampadd(DAY, 45, l_shipdate)").as("l_shipend"))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") % 17 === 0)
      .select(col("o_orderkey"), col("o_orderdate"),
        expr("timestampadd(DAY, 30, o_orderdate)").as("o_orderend"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2))
    val naive = li.join(ord,
        col("l_shipdate") <= col("o_orderend") &&
          col("o_orderdate") <= col("l_shipend"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
      .collect().map(key).toSeq.sorted
    val binned = RangeJoin.binnedOverlap(li, col("l_shipdate"), col("l_shipend"),
        ord, col("o_orderdate"), col("o_orderend"),
        RangeJoin.timestampBins(32))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
      .collect().map(key).toSeq.sorted
    assert(naive.nonEmpty)
    assert(binned === naive) // exactly once per pair — a multi-bin
                             // overlap must NOT produce duplicates
    assert(!RangeJoin.binnedOverlap(li, col("l_shipdate"), col("l_shipend"),
        ord, col("o_orderdate"), col("o_orderend"),
        RangeJoin.timestampBins(32))
      .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("sentinel 'unbounded' bounds cannot overflow the span guard") {
    import spark.implicits._
    // lo = Long.MinValue as an "unbounded below" sentinel: a raw long
    // binHi - binLo wraps negative and would BYPASS the cap straight
    // into the unbounded sequence; the double-space span must raise
    val points = Seq((1L, 50L)).toDF("pid", "v")
    val intervals = Seq((10L, Long.MinValue, 100L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.binned(points, col("v"), intervals, col("lo"), col("hi"),
        c => c, maxBins = 1000L).collect()
    }
    assert(ex.getMessage.contains("maxBins"), ex.getMessage)
  }
}
