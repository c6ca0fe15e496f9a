package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class IsotonicSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Build rows realizing (k → n, pos) bucket stats. */
  private def mk(stats: Seq[(Long, Long, Long)], grp: String = "g") =
    stats.flatMap { case (k, n, pos) =>
      (0L until n).map(i => (grp, k, i < pos))
    }.toDF("grp", "k", "lab")

  test("textbook PAV: violator pools average out, monotone result") {
    // raw rates by bucket: .2, .6, .4, .8 → buckets 1,2 violate? no,
    // 2→3 violates (.6 > .4): pool to (6+4)/(10+10)=.5 → .2,.5,.5,.8
    val df = mk(Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L),
      (3L, 10L, 8L)))
    val out = Isotonic.calibrate(df, "grp", "k", "lab")
      .orderBy("k").collect()
    assert(out.map(_.getDouble(5)).toSeq == Seq(0.2, 0.5, 0.5, 0.8))
    assert(out.map(_.getDouble(4)).toSeq == Seq(0.2, 0.6, 0.4, 0.8))
  }

  test("cascade merge: strictly decreasing input pools to one flat level") {
    val df = mk(Seq((0L, 10L, 9L), (1L, 10L, 6L), (2L, 10L, 3L)))
    val out = Isotonic.calibrate(df, "grp", "k", "lab")
      .orderBy("k").collect()
    assert(out.map(_.getDouble(5)).forall(_ == 0.6))
  }

  test("monotonicity + weighted-mean preservation on noisy data") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 3000).map { _ =>
      val k = rnd.nextInt(50).toLong
      ("g", k, rnd.nextDouble() < (k / 60.0 + 0.3 * rnd.nextDouble()))
    }
    val df = rows.toDF("grp", "k", "lab")
    val out = Isotonic.calibrate(df, "grp", "k", "lab")
      .orderBy("k").collect()
    val iso = out.map(_.getDouble(5))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-12 },
      "monotone non-decreasing")
    val wMeanIso = out.map(r => r.getDouble(5) * r.getLong(2)).sum
    val totalPos = out.map(_.getLong(3)).sum.toDouble
    assert(math.abs(wMeanIso - totalPos) < 1e-6,
      "pooling preserves the weighted mean")
  }

  test("PAV equals the minimax characterization (the DuckDB oracle's formula)") {
    // iso(k) = max_{i<=k} min_{j>=k} pooled-rate[i..j], decided on exact
    // rationals (cross-multiplication) then rounded by ONE IEEE divide —
    // the same contract calibrateSql relies on. Randomized buckets.
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val nb = 1 + rnd.nextInt(12)
      val stats = (0 until nb).map { k =>
        val n = 1L + rnd.nextInt(9)
        (k.toLong, n, rnd.nextLong(n + 1))
      }
      val out = Isotonic.calibrate(mk(stats), "grp", "k", "lab")
        .orderBy("k").collect().map(_.getDouble(5))
      val exp = (0 until nb).map { k =>
        // max over i<=k of (min over j>=k of interval rate), rationals
        val best = (0 to k).map { i =>
          (k until nb).map { j =>
            val p = stats.slice(i, j + 1).map(_._3).sum
            val n = stats.slice(i, j + 1).map(_._2).sum
            (p, n)
          }.reduce((a, b) => if (a._1 * b._2 <= b._1 * a._2) a else b)
        }.reduce((a, b) => if (a._1 * b._2 >= b._1 * a._2) a else b)
        best._1.toDouble / best._2
      }
      assert(out.toSeq == exp, s"stats=$stats")
    }
  }

  test("groups are independent and fit is partition-invariant") {
    val df = mk(Seq((0L, 4L, 3L), (1L, 4L, 1L))) // one group, violator
      .union(mk(Seq((0L, 4L, 0L), (1L, 4L, 4L)), grp = "h"))
    val a = Isotonic.calibrate(df.repartition(1), "grp", "k", "lab")
      .orderBy("grp", "k").collect().map(_.toSeq)
    val b = Isotonic.calibrate(df.repartition(5), "grp", "k", "lab")
      .orderBy("grp", "k").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // g pools to .5 everywhere, h stays 0 → 1
    assert(a(0)(5) == 0.5 && a(1)(5) == 0.5)
    assert(a(2)(5) == 0.0 && a(3)(5) == 1.0)
  }
}
