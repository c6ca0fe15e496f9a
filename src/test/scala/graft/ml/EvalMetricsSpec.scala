package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class EvalMetricsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("calibration: hand-computed bucket stats and Brier") {
    // k/100 scores: bucket 0 ← {5 lab=0, 5 lab=1}, bucket 9 ← {95 lab=1}
    val df = Seq((5, false), (5, true), (95, true), (100, true))
      .toDF("k", "lab")
    val out = Eval.calibration(df, "k", 100, "lab", 10)
      .orderBy("bucket").collect()
    assert(out.length == 2)
    val b0 = out(0)
    assert(b0.getLong(0) == 0 && b0.getLong(1) == 2 && b0.getLong(2) == 1)
    assert(b0.getDouble(3) == 0.05) // avg_p
    assert(b0.getDouble(4) == 0.5)  // frac_pos
    // brier bucket0 = ((0-.05)^2 + (1-.05)^2)/2 = (0.0025+0.9025)/2
    assert(math.abs(b0.getDouble(5) - 0.4525) < 1e-12)
    val b9 = out(1)
    assert(b9.getLong(0) == 9 && b9.getLong(1) == 2)
    // k=100 clamps into bucket 9; brier = ((1-.95)^2 + 0)/2
    assert(math.abs(b9.getDouble(5) - 0.00125) < 1e-12)
  }

  test("confusionF1: counts and metrics") {
    val df = Seq(
      ("a", true, true), ("a", true, false), ("a", false, true),
      ("a", false, false), ("b", false, false))
      .toDF("g", "pred", "lab")
    val rows = Eval.confusionF1(df, "g", "pred", "lab")
      .orderBy("g").collect()
    val a = rows(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) == ((1L, 1L, 1L, 1L)))
    assert(a.getDouble(5) == 0.5 && a.getDouble(6) == 0.5 && a.getDouble(7) == 0.5)
    val b = rows(1)
    assert(b.getLong(4) == 1L && b.isNullAt(5) && b.isNullAt(6) && b.isNullAt(7))
  }

  test("cohensKappa: textbook two-rater example") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no → po=.7, pe=.5, κ=.4
    val rows =
      Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
        Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val df = rows.map { case (a, b) => ("g", a, b) }.toDF("g", "r1", "r2")
    val out = Eval.cohensKappa(df, "g", "r1", "r2").collect().head
    assert(out.getLong(1) == 50)
    assert(math.abs(out.getDouble(2) - 0.7) < 1e-12)
    assert(math.abs(out.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(out.getDouble(4) - 0.4) < 1e-12)
  }

  test("cohensKappa: degenerate pe=1 yields NULL") {
    val df = Seq(("g", true, true), ("g", true, true)).toDF("g", "r1", "r2")
    val out = Eval.cohensKappa(df, "g", "r1", "r2").collect().head
    assert(out.isNullAt(4))
  }
}
