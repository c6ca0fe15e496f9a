package graft.text

import org.scalatest.funsuite.AnyFunSuite

class ZipfSlopeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("planted 1/rank corpus fits slope ~ -1") {
    // word_r appears floor(1000/r) times, r = 1..200
    val text = (1 to 200).flatMap(r => Seq.fill(1000 / r)(s"w$r"))
    val docs = text.grouped(500).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val out = TextAnalysis.zipfSlope(docs, topN = 150).head()
    assert(out.getLong(0) == 150)
    val slope = out.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"zipfian slope ~ -1, got $slope")
  }

  test("uniform template flood flattens the slope toward 0") {
    val docs = Seq.fill(50)((1 to 40).map(i => s"t$i").mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val slope = TextAnalysis.zipfSlope(docs, topN = 40).head().getDouble(1)
    assert(math.abs(slope) < 0.05, s"flat spectrum -> slope ~0, got $slope")
  }
}
