package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native rolling-hash gram expression: value parity with a reference
  * Scala fold, edge cases, and the codegen-fusion claim. */
class RollingHashGramsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Reference implementation: direct polynomial hash of each substring
    * (no rolling update), the semantics the rolling recurrence must
    * reproduce through Long wraparound. */
  private def reference(s: String, k: Int): Seq[Long] =
    (0 to s.length - k).map { p =>
      var h = 0L
      var i = p
      while (i < p + k) { h = h * 1000003L + s.charAt(i); i += 1 }
      h
    }

  private def viaExpr(s: String, k: Int): Seq[Long] = {
    import spark.implicits._
    RollingHashGrams.register(spark)
    Seq(s).toDF("text")
      .select(expr(s"rolling_hash_grams(text, $k)").as("h"))
      .head().getSeq[Long](0)
  }

  test("matches the direct per-substring hash on varied inputs") {
    val rnd = new scala.util.Random(11)
    val cases = Seq("abcdefghij", "aaaaaaaaaaaa", "héllo wörld ünïcode",
      new String(Array.fill(500)(('a' + rnd.nextInt(26)).toChar)))
    for (s <- cases; k <- Seq(1, 3, 10)) {
      assert(viaExpr(s, k) === reference(s, k), s"input='$s' k=$k")
    }
  }

  test("shorter-than-k and empty strings yield empty arrays; nulls stay null") {
    import spark.implicits._
    RollingHashGrams.register(spark)
    assert(viaExpr("abc", 10).isEmpty)
    assert(viaExpr("", 3).isEmpty)
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(expr("rolling_hash_grams(text, 5)").as("h")).head()
    assert(r.isNullAt(0))
  }

  test("the hashed position build fuses scan, hash, and explode into one codegen stage") {
    import spark.implicits._
    RollingHashGrams.register(spark)
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
      .where(length(col("text")) >= 10)
      .select(col("doc_id"), posexplode(expr("rolling_hash_grams(text, 10)")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("SerializeFromObject"),
      s"expected no object-encoder boundary, got:\n$plan")
    // the "*(n)" operator prefix is executedPlan.toString's marker for
    // membership in WholeStageCodegen stage n
    assert(plan.contains("*(1) Generate"), s"expected codegen'd generate, got:\n$plan")
  }
}
