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

      // levenshtein bound predicates rewrite to the banded 3-arg form
      import org.apache.spark.sql.catalyst.expressions.Levenshtein
      val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50).select("doc_id", "text")
      val a = docs.toDF("ida", "ta")
      val b = docs.toDF("idb", "tb")
      val q = a.crossJoin(b).filter("ida < idb AND levenshtein(ta, tb) <= 30")
      val thresholds = q.queryExecution.optimizedPlan.expressions.flatMap(
        _.collect { case Levenshtein(_, _, t) => t })
      assert(thresholds.nonEmpty && thresholds.forall(_.isDefined),
        s"expected banded levenshtein, got $thresholds")
      // equivalence: the rewritten predicate returns the same pairs as
      // an un-extended session's plain form
      val got = q.select("ida", "idb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = base.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50).select("doc_id", "text")
      val ref = plain.toDF("ida", "ta").crossJoin(plain.toDF("idb", "tb"))
        .filter("ida < idb AND levenshtein(ta, tb) <= 30")
        .select("ida", "idb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === ref)
      // negative literal bound is not rewritten (and stays correct)
      assert(a.crossJoin(b).filter("levenshtein(ta, tb) <= -1").count() === 0L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
