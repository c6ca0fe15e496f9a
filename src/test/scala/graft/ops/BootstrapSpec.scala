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

  test("1-row groups: degenerate replicates drop, CIs stay non-NULL") {
    // a 1-row group draws multiplicity 0 with prob e^-1 per replicate;
    // the op must never rank a NULL estimate (ADVICE r7) — surviving
    // count b < B, bounds defined, and the single value IS the CI.
    val df = (mk(300, "big", 5, 2) ++ Seq(("tiny", "tiny-1", 42.0)))
      .toDF("g", "id", "v")
    val rows = Bootstrap.meanCi(df, "g", "v", "id", b = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    val t = rows("tiny")
    assert(!t.isNullAt(3) && !t.isNullAt(4), "CI bounds non-NULL")
    assert(t.getDouble(3) == 42.0 && t.getDouble(4) == 42.0,
      "1-row group: every surviving replicate estimates the single value")
    assert(t.getLong(5) < 100 && t.getLong(5) > 0,
      s"some replicates degenerate (got b=${t.getLong(5)})")
    assert(rows("big").getLong(5) == 100, "large group keeps all replicates")
  }

  test("integer-valued vector path ≡ exploded path, both hash modes") {
    // integerValued=true rides the r15 PoissonDraws/WeightedVecSumAgg
    // vector spelling; on integer data the dsum exploded spelling
    // computes the SAME estimates (exact sums, same draws), so
    // equality here pins the vector path row-for-row — including the
    // 1-row-group degenerate-replicate drops.
    val df = (mk(400, "a", 20, 6).map { case (g, i, v) => (g, i, v.floor) } ++
      Seq(("tiny", "tiny-1", 42.0))).toDF("g", "id", "v")
    for (fast <- Seq(false, true)) {
      val vecPath = Bootstrap.meanCi(df, "g", "v", "id", b = 60,
        integerValued = true, fastHash = fast)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      val explodedPath = Bootstrap.meanCi(df, "g", "v", "id", b = 60,
        integerValued = false, fastHash = fast)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(vecPath.toSeq == explodedPath.toSeq, s"fast=$fast")
    }
  }

  test("fast xxhash64 path: same n/mean, valid intervals, partition-invariant") {
    val df = (mk(500, "a", 20, 6) ++ mk(900, "b", -3, 2)).toDF("g", "id", "v")
    val slow = Bootstrap.meanCi(df, "g", "v", "id", b = 60)
      .collect().map(r => r.getString(0) -> r).toMap
    val fast = Bootstrap.meanCi(df, "g", "v", "id", b = 60, fastHash = true)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      // n and mean are randomness-independent: must match the md5 twin
      assert(fast(g).getLong(1) == slow(g).getLong(1))
      assert(fast(g).getDouble(2) == slow(g).getDouble(2))
      // the fast draw still yields a bracketing, nonzero-width interval
      assert(fast(g).getDouble(3) < fast(g).getDouble(4))
      assert(fast(g).getDouble(3) <= fast(g).getDouble(2) &&
        fast(g).getDouble(2) <= fast(g).getDouble(4))
    }
    val p1 = Bootstrap.meanCi(df.repartition(2), "g", "v", "id", b = 60,
      fastHash = true).collect().map(_.toSeq).sortBy(_.head.toString)
    val p7 = Bootstrap.meanCi(df.repartition(7), "g", "v", "id", b = 60,
      fastHash = true).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(p1.toSeq == p7.toSeq)
  }
}
