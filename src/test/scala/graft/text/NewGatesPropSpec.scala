package graft.text

import graft.ops.BlockDiff
import graft.sources.Drift
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded, reproducible) invariants for the
  * continued-session operator batch — properties that must hold on ANY
  * input, not just the fixtures. */
class NewGatesPropSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val words = Array("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta")

  test("containment dominates jaccard and both stay in (0, 1]") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 6) {
      val n = 4 + rnd.nextInt(12)
      val docs = (0 until n).map { i =>
        val len = 6 + rnd.nextInt(6)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val jac = Shingles.exactJaccardPairs(df, 0.0).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
      val cont = Shingles.exactContainmentPairs(df, 0.0).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
      assert(jac.keySet === cont.keySet) // same candidates at threshold 0
      jac.foreach { case (k, j) =>
        val c = cont(k)
        assert(j > 0.0 && j <= 1.0 && c <= 1.0)
        assert(c >= j - 1e-9, s"containment $c < jaccard $j for $k")
      }
    }
  }

  test("KS bounds: ks(a,a) = 0 and ks(a,b) ∈ [0,1] on random samples") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val a = Seq.fill(40)(("g", rnd.nextInt(50).toDouble))
      val b = Seq.fill(40)(("g", rnd.nextInt(50).toDouble))
      val da = a.toDF("g", "v"); val db = b.toDF("g", "v")
      assert(Drift.ks(da, da, "g", "v").collect().head.getDouble(1) === 0.0)
      val ks = Drift.ks(da, db, "g", "v").collect().head.getDouble(1)
      assert(ks >= 0.0 && ks <= 1.0)
    }
  }

  test("block diff flags ANY random single edit, and only its bucket") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 8) {
      val n = 8 + rnd.nextInt(32)
      val idx = rnd.nextInt(n)
      val base = (0 until n).map(i => (i.toLong, s"row $i payload"))
      val edited = base.updated(idx, (idx.toLong, s"row $idx CHANGED"))
      val got = BlockDiff.changedBuckets(
        base.toDF("doc_id", "text"), edited.toDF("doc_id", "text"),
        "doc_id", Seq("text"), 8).collect()
      assert(got.map(_.getLong(0)).toSeq === Seq(idx.toLong % 8))
    }
  }
}
