package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Preference-pair (DPO-style) builder: ranked-pool binarization into
  * (chosen, rejected) pairs with an integer score margin. */
class PreferencePairsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def mk(rows: Seq[(Long, String)], lang: String = "en",
      source: String = "web") =
    rows.map { case (id, t) => (id, t, lang, source, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // score = alpha_chars + 2*distinct_tokens; craft texts with known scores
  private def textOfScore(alpha: Int): String = "a" * alpha // 1 token: alpha + 2

  test("chosen outranks rejected by at least the margin; ids distinct") {
    val docs = mk(Seq(1L -> textOfScore(50), 2L -> textOfScore(30),
      3L -> textOfScore(10), 4L -> textOfScore(9)))
    val out = PreferencePairs.pairs(docs, topK = 2, bottomK = 2, margin = 5L)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("chosen_score") -
        r.getAs[Long]("rejected_score") >= 5L)
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
      assert(Set("train", "test").contains(r.getAs[String]("split")))
    }
  }

  test("pair fan-out is bounded by topK x bottomK per pool") {
    val docs = mk((1L to 40L).map(i => i -> textOfScore(10 + i.toInt)))
    val out = PreferencePairs.pairs(docs, topK = 3, bottomK = 2, margin = 0L)
    assert(out.count() <= 3L * 2L)
  }

  test("small pool below margin yields no pairs; singleton pool yields none") {
    val flat = mk(Seq(1L -> textOfScore(20), 2L -> textOfScore(19)))
    assert(PreferencePairs.pairs(flat, margin = 5L).count() === 0L)
    val single = mk(Seq(1L -> textOfScore(20)))
    assert(PreferencePairs.pairs(single, margin = 0L).count() === 0L)
  }

  test("pools are independent and assignment is repartition-stable") {
    val a = mk(Seq(1L -> textOfScore(50), 2L -> textOfScore(10)))
    val b = mk(Seq(11L -> textOfScore(60), 12L -> textOfScore(20)),
      source = "books")
    val docs = a.unionByName(b)
    val out = PreferencePairs.pairs(docs, margin = 5L).collect()
    // best-vs-worst inside each pool, never across
    assert(out.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))).toSet ===
      Set(("web", 1L, 2L), ("books", 11L, 12L)))
    val rep = PreferencePairs.pairs(docs.repartition(7), margin = 5L)
      .collect()
    assert(rep.map(_.toSeq).toSet === out.map(_.toSeq).toSet)
  }

  test("deterministic tie-break: equal scores rank by doc_id") {
    // three equal-score docs + one low: chosen must be the LOWEST id
    // of the top scores (score desc, doc_id asc)
    val docs = mk(Seq(5L -> textOfScore(30), 3L -> textOfScore(30),
      9L -> textOfScore(30), 1L -> textOfScore(5)))
    val out = PreferencePairs.pairs(docs, topK = 1, bottomK = 1, margin = 1L)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("chosen_id") === 3L)
    assert(out.head.getAs[Long]("rejected_id") === 1L)
  }

  test("gate-scale sanity on the documents fixture: plan is window + bounded join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = PreferencePairs.pairs(docs)
    val n = out.count()
    assert(n > 0)
    // bounded: at most topK*bottomK per (lang, source) pool
    val pools = docs.select("lang", "source").distinct().count()
    assert(n <= pools * 4)
  }
}
