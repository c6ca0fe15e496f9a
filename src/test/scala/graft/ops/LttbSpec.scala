package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class LttbSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("keeps endpoints and the max-area spike in the middle bucket") {
    // width 10: bucket0 = endpoints, bucket1 has a spike at t=15,
    // bucket2 = endpoints. Neighbor averages are flat y=0, so the
    // spike (y=100) wins bucket1 on area.
    val df = Seq(
      ("a", 0L, 0.0, 1L), ("a", 5L, 0.0, 2L),
      ("a", 12L, 1.0, 3L), ("a", 15L, 100.0, 4L), ("a", 18L, 1.0, 5L),
      ("a", 22L, 0.0, 6L), ("a", 27L, 0.0, 7L))
      .toDF("s", "t", "y", "k")
    val out = Lttb.downsample(df, "s", "t", "y", "k", 10L)
      .orderBy("bucket").collect()
    assert(out.length == 3)
    assert(out(0).getLong(2) == 0L)   // first bucket → first point
    assert(out(1).getLong(2) == 15L)  // spike survives downsampling
    assert(out(1).getDouble(3) == 100.0)
    assert(out(2).getLong(2) == 27L)  // last bucket → last point
  }

  test("single-bucket series keeps its first point; one point per bucket per series") {
    val df = Seq(("b", 3L, 7.0, 1L), ("b", 4L, 9.0, 2L))
      .toDF("s", "t", "y", "k")
    val out = Lttb.downsample(df, "s", "t", "y", "k", 10L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L)
  }

  test("downsampled size is bounded by series x buckets") {
    val df = (1 to 1000).map(i => ("u" + (i % 3), i.toLong, (i % 17).toDouble, i.toLong))
      .toDF("s", "t", "y", "k")
    val out = Lttb.downsample(df, "s", "t", "y", "k", 100L)
    // t ∈ [1,1000], width 100 → buckets 0..9 for all 3 series, plus
    // t=1000 alone in bucket 10 for its series
    assert(out.count() == 3 * 10 + 1)
    // exactly one row per (series, bucket)
    assert(out.groupBy("series", "bucket").count()
      .filter($"count" =!= 1).count() == 0)
  }
}
