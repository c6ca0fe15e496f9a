package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def totals(sf: String) = {
    val rows = QualityClassifier.classify(
      spark.read.parquet(s"/root/testdata/$sf/documents.parquet")).collect()
    val n = rows.map(_.getLong(1)).sum
    val lab = rows.map(_.getLong(2)).sum
    val pred = rows.map(_.getLong(3)).sum
    val agree = rows.map(_.getLong(4)).sum
    (n, lab, pred, agree)
  }

  test("the learned model is non-degenerate and beats the majority class") {
    val (n, lab, pred, agree) = totals("sf0.001")
    assert(n === 500L)
    // non-degenerate: both classes predicted
    assert(pred > 0L && pred < n)
    // generalization floor: agreement must beat always-predict-majority
    val majority = math.max(lab, n - lab)
    assert(agree > majority, s"agree $agree <= majority $majority")
  }

  test("counts are internally consistent and repartition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = QualityClassifier.classify(docs).orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val b = QualityClassifier.classify(docs.repartition(13)).orderBy("lang")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(a === b)
    a.foreach { case (_, n, lab, pred, agree) =>
      assert(lab <= n && pred <= n && agree <= n)
      // agreement identity bound: |lab - pred| <= disagreements
      assert((n - agree) >= math.abs(lab - pred))
    }
  }
}
