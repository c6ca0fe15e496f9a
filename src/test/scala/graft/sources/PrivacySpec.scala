package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity audit + suppression enforcement. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private lazy val people = {
    import spark.implicits._
    // (zip, age_band, disease): class (10001,30) has 3 members but is
    // homogeneous; (10001,40) has 1; (10002,30) has 4 and is diverse
    Seq(
      ("10001", 30, "flu"), ("10001", 30, "flu"), ("10001", 30, "flu"),
      ("10001", 40, "cold"),
      ("10002", 30, "flu"), ("10002", 30, "cold"),
      ("10002", 30, "asthma"), ("10002", 30, "flu"))
      .toDF("zip", "age_band", "disease")
  }

  test("audit reports class size, l-diversity, and both verdicts") {
    val a = Privacy.kAnonymityAudit(people, Seq("zip", "age_band"), "disease", k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(a(("10001", 30)) === ((3L, 1L, false, true)))  // k-anonymous, leaks
    assert(a(("10001", 40)) === ((1L, 1L, true, true)))   // suppress
    assert(a(("10002", 30)) === ((4L, 3L, false, false))) // safe
  }

  test("suppression keeps only k-anonymous (and optionally diverse) rows") {
    val kOnly = Privacy.suppressSmallClasses(people, Seq("zip", "age_band"),
      "disease", k = 3)
    assert(kOnly.count() === 7) // loses the singleton class
    val diverse = Privacy.suppressSmallClasses(people, Seq("zip", "age_band"),
      "disease", k = 3, minL = 2)
    // additionally loses the homogeneous (10001,30) class
    assert(diverse.count() === 4)
    assert(diverse.select("zip").distinct().collect().map(_.getString(0)).toSeq
      === Seq("10002"))
  }

  test("enforcement joins the bounded verdict frame back as a broadcast semi join") {
    val plan = Privacy.suppressSmallClasses(people, Seq("zip", "age_band"),
      "disease", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi enforcement, got:\n$plan")
  }
}
