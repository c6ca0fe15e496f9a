package graft.text

import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("separable vocab: test-fold predictions land on the diagonal") {
    import spark.implicits._
    // two languages with disjoint vocabularies — any trained model
    // must classify every test doc correctly
    val rnd = new scala.util.Random(67)
    val docs = (1 to 300).map { i =>
      val lab = if (i % 2 == 0) "aa" else "bb"
      val text = (1 to 12).map(_ => s"${lab}_w${rnd.nextInt(20)}")
        .mkString(" ")
      (i.toLong, lab, text)
    }.toDF("doc_id", "lang", "text")
    val rows = NaiveBayes.confusion(docs, "doc_id", "text", "lang", 0.8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rows.nonEmpty)
    assert(rows.keys.forall(k => k._1 == k._2),
      s"off-diagonal predictions: $rows")
    // the test fold is ~20% of 300 — sanity that it isn't empty/full
    val nTest = rows.values.sum
    assert(nTest > 10 && nTest < 150)
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    // overlapping vocab → genuinely ambiguous docs, so determinism is
    // non-trivial (argmax tie-break + decimal sums must hold)
    val docs = (1 to 200).map { i =>
      val lab = if (rnd.nextBoolean()) "xx" else "yy"
      val text = ((1 to 6).map(_ => s"${lab}_w${rnd.nextInt(5)}") ++
        (1 to 6).map(_ => s"shared_w${rnd.nextInt(5)}")).mkString(" ")
      (i.toLong, lab, text)
    }.toDF("doc_id", "lang", "text")
    val a = NaiveBayes.confusion(docs.repartition(13), "doc_id", "text",
        "lang", 0.75)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val b = NaiveBayes.confusion(docs.coalesce(1), "doc_id", "text",
        "lang", 0.75)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(a === b)
    // mostly-correct sanity: the planted signal should win overall
    val correct = a.filter(k => k._1._1 == k._1._2).values.sum
    assert(correct.toDouble / a.values.sum > 0.8)
  }
}
