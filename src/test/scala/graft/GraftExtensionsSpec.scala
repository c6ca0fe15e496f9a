package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: a session built with the extensions injector resolves
  * vec_dot from SQL with no imperative registration. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions route registers vec_dot at session build") {
    // make sure the shared context exists, then build a SEPARATE
    // session (same SparkContext) with the injector applied
    val base = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      val out = s.sql(
        """SELECT vec_dot(
          |  cast(array(1.0, 2.0, 3.0) as array<float>),
          |  cast(array(4.0, 5.0, 6.0) as array<float>)) AS d""".stripMargin)
        .collect()
      assert(out.length === 1)
      assert(out.head.getDouble(0) === 32.0)

      // nfc_normalize injected too, and the idempotence optimizer rule
      // collapses the nested call to one expression (a non-foldable
      // parquet column — literals would constant-fold away entirely)
      val nested = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("nfc_normalize(nfc_normalize(text)) AS t")
      assert(nested.limit(1).collect().head.getString(0).nonEmpty)
      val occurrences = nested.queryExecution.optimizedPlan.expressions
        .map(_.collect { case n: graft.functions.NormalizeNfc => n }.size).sum
      assert(occurrences === 1, s"expected collapsed plan, got $occurrences")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
