package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._
  import Expectations._

  private def df = Seq(
    (1L, Some(10.0), "A", "abc"),
    (2L, Some(60.0), "B", "def"),
    (3L, None, "A", "ghi"),
    (3L, Some(20.0), "C", "x1z"))
    .toDF("id", "v", "flag", "s")

  test("one pass, one verdict per rule, correct ratios and verdicts") {
    val out = evaluate(df, Seq(
      NotNull("v", 0.7),            // 3/4 = .75 → pass
      Unique("id"),                 // 3/4 → fail
      InRange("v", 0, 50, 0.5),     // 2/4 → pass at .5
      InSet("flag", Seq("A", "B")), // 3/4 → fail at 1.0
      MatchesRegex("s", "^[a-z]+$", 0.7) // 3/4 → pass
    )).orderBy("ord").collect()
    assert(out.map(_.getBoolean(5)).toSeq ==
      Seq(true, false, true, false, true))
    assert(out(0).getDouble(3) == 0.75)
    assert(out(1).getDouble(3) == 0.75)
    assert(out(2).getDouble(3) == 0.5)
  }

  test("suite folds in a single aggregate job (rules-sized output)") {
    val out = evaluate(df, Seq(NotNull("v"), InRange("v", 0, 100)))
    assert(out.count() == 2)
    // whole suite must be one aggregate over the table: exactly one
    // Aggregate node consuming the scan in the optimized plan
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), "no per-rule re-scans/joins")
  }

  test("empty-set and null semantics: nulls fail value rules") {
    val out = evaluate(df, Seq(InSet("flag", Seq("Z"))))
      .collect().head
    assert(out.getDouble(3) == 0.0 && !out.getBoolean(5))
  }
}
