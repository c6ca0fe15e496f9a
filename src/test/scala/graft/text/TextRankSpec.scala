package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextRankSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand graph: hub word outranks leaves; symmetric leaves tie") {
    import spark.implicits._
    // path graph x — y — z: y is the hub, x and z are symmetric
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val scores = TextRank.keywords(docs, k = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.keySet === Set("x", "y", "z"))
    assert(scores("y") > scores("x"))
    assert(math.abs(scores("x") - scores("z")) < 1e-12)
    // mass conservation: Σ score = 1 (symmetric edges → no dangling)
    assert(math.abs(scores.values.sum - 1.0) < 1e-9)
  }

  test("quantized variant tracks the float variant within 1e-9 units") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val float = TextRank.keywords(docs, k = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val quant = TextRank.keywordsQuantized(docs, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quant.keySet === float.keySet)
    // each quantized score sits within the accumulated floor error of
    // the float score: ≤ iters · (nodes+1) quanta, a loose 1e-6 here
    float.foreach { case (w, s) =>
      assert(math.abs(quant(w) / 1e9 - s) < 1e-6, s"word $w")
    }
  }

  test("corpus run: k rows, conserved mass on the full vocabulary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val top = TextRank.keywords(docs, k = 20)
    val rows = top.collect()
    assert(rows.length === 20)
    // scores descend with the declared tiebreak
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s > 0 && s < 1))
  }
}
