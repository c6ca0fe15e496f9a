package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("latest-at-or-before semantics, including ties and no-match") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"),
      (2L, 100L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 1.0),  // tie with l1's time → matches (inclusive <=)
      (1L, 150L, 2.0),
      (2L, 500L, 9.0))  // after l3 → no match
      .toDF("k", "t", "v")
    val out = AsofJoin.latestAsOf(left, right, Seq("k"), "t",
      payloadCols = Seq("v"), rightTimeAs = "rt")
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[Any]("rt")), Option(r.getAs[Any]("v")))).toMap
    assert(out("l0") === (None, None))               // nothing at or before 50
    assert(out("l1") === (Some(100L), Some(1.0)))    // inclusive tie
    assert(out("l2") === (Some(150L), Some(2.0)))    // latest of the two
    assert(out("l3") === (None, None))               // right row is later
  }

  test("left columns and row count are preserved") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong, s"p$i"))
      .toDF("k", "t", "payload")
    val right = Seq((0L, 10L, 1.0), (1L, 20L, 2.0)).toDF("k", "t", "v")
    val out = AsofJoin.latestAsOf(left, right, Seq("k"), "t", Seq("v"))
    assert(out.count() === 100L)
    assert(out.columns.toSet === Set("k", "t", "payload", "asof_time", "v"))
  }
}
