package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def df(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  private def psiOf(old: Seq[(String, Double)], nw: Seq[(String, Double)]) =
    Drift.psi(df(old), df(nw), "g", "v", hi = 100.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("identical distributions read ~0; a mean shift reads > 0.25") {
    val base = (1 to 500).map(i => ("a", (i % 90).toDouble))
    val shifted = (1 to 500).map(i => ("a", (i % 90) / 3.0)) // squashed low
    val same = psiOf(base, base)
    assert(math.abs(same("a")) < 0.001, s"control PSI ${same("a")}")
    val moved = psiOf(base, shifted)
    assert(moved("a") > 0.25, s"drift PSI ${moved("a")}")
  }

  test("groups are independent; a group present on one side only still reports") {
    val old = (1 to 100).map(i => ("a", i.toDouble % 50)) ++
      (1 to 100).map(i => ("only_old", i.toDouble % 50))
    val nw = (1 to 100).map(i => ("a", i.toDouble % 50))
    val got = psiOf(old, nw)
    assert(got.keySet === Set("a", "only_old"))
    assert(math.abs(got("a")) < 0.001)
    // all new-side mass is smoothing-only -> large PSI
    assert(got("only_old") > 0.0)
  }

  private def ksOf(old: Seq[(String, Double)], nw: Seq[(String, Double)]) =
    Drift.ks(df(old), df(nw), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("KS: identical distributions read 0; a location shift reads its exact gap") {
    val base = (1 to 400).map(i => ("a", (i % 100).toDouble))
    assert(ksOf(base, base)("a") === 0.0)
    // shift by +50 over a 100-wide uniform: CDF gap is exactly 0.5
    val shifted = base.map { case (g, v) => (g, v + 50.0) }
    val ks = ksOf(base, shifted)("a")
    assert(math.abs(ks - 0.5) < 0.01, s"KS $ks")
  }

  test("KS beats PSI on a sub-bin-width shift") {
    // a +6 shift inside one 12.5-wide PSI bin (hi=100, 8 bins): PSI
    // sees only partial bin spill, KS reads the full 6% CDF gap
    val base = (1 to 2000).map(i => ("a", (i % 100).toDouble))
    val nudged = base.map { case (g, v) => (g, v + 6.0) }
    val ks = ksOf(base, nudged)("a")
    assert(ks >= 0.05, s"KS missed the shift: $ks")
  }

  test("KS: disjoint supports read 1.0") {
    val lo = (1 to 50).map(i => ("a", i.toDouble))
    val hi = (1 to 50).map(i => ("a", 1000.0 + i))
    assert(ksOf(lo, hi)("a") === 1.0)
  }

  test("values outside [0, hi) clamp into edge bins and stay counted") {
    val got = Drift.psi(
      df(Seq(("a", 250.0), ("a", -40.0), ("a", 10.0))),
      df(Seq(("a", 99.0), ("a", 10.0))), "g", "v", hi = 100.0)
      .collect().map(r => (r.getString(0),
        r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 1)
    val (_, psi, nOld, nNew) = got(0)
    assert(nOld === 3L && nNew === 2L) // the negative row is NOT dropped
    assert(!psi.isNaN && !psi.isInfinite)
  }
}
