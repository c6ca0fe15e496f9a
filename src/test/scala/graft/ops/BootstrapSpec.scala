package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def mk(n: Int, grp: String, mean: Double, spread: Double) = {
    val rnd = new scala.util.Random(grp.hashCode)
    (1 to n).map(i => (grp, s"$grp-$i",
      mean + (rnd.nextDouble() * 2 - 1) * spread))
  }

  test("CI brackets the sample mean and shrinks with n") {
    val df = (mk(200, "small", 50, 10) ++ mk(5000, "big", 50, 10))
      .toDF("g", "id", "v")
    val out = Bootstrap.meanCi(df, "g", "v", "id", b = 80)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((_, (mean, lo, hi)) <- out) {
      assert(lo <= mean && mean <= hi, s"CI brackets mean: $lo <= $mean <= $hi")
      assert(lo < hi)
    }
    val widthSmall = out("small")._3 - out("small")._2
    val widthBig = out("big")._3 - out("big")._2
    // se ~ spread/sqrt(n): 25x rows → ~5x narrower (allow slack)
    assert(widthBig < widthSmall / 2.5,
      s"CI shrinks with n: big=$widthBig small=$widthSmall")
  }

  test("replicate estimates vary (multiplicities are not degenerate)") {
    val df = mk(300, "g", 10, 5).toDF("g", "id", "v")
    val out = Bootstrap.meanCi(df, "g", "v", "id", b = 50).head()
    assert(out.getDouble(3) < out.getDouble(4), "nonzero CI width")
    assert(out.getLong(5) == 50)
  }

  test("fully deterministic under repartitioning") {
    val df = mk(400, "g", 0, 1).toDF("g", "id", "v")
    val a = Bootstrap.meanCi(df.repartition(1), "g", "v", "id", b = 40)
      .collect().map(_.toSeq)
    val b = Bootstrap.meanCi(df.repartition(7), "g", "v", "id", b = 40)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
