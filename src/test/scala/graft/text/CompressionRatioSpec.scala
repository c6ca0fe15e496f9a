package graft.text

import org.scalatest.funsuite.AnyFunSuite

class CompressionRatioSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def ratios(texts: (Long, String)*): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    TextAnalysis.compressionRatio(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("repetition compresses far below prose; random junk above it") {
    val rnd = new scala.util.Random(7L)
    val loop = ("spam ham " * 200).trim
    val prose = ("the quick brown fox jumps over a lazy dog while " +
      "seventeen engineers debate the merits of columnar storage " +
      "and vectorized execution in the afternoon sun ") * 10
    val junk = Array.fill(1600)((rnd.nextInt(94) + 33).toChar).mkString
    val got = ratios((1L, loop), (2L, prose), (3L, junk))
    assert(got(1L)._3 < 0.1, s"loop ratio ${got(1L)._3}")
    assert(got(2L)._3 > got(1L)._3 && got(2L)._3 < 0.6,
      s"prose ratio ${got(2L)._3}")
    assert(got(3L)._3 > 0.7, s"junk ratio ${got(3L)._3}")
  }

  test("deterministic across partitionings and runs") {
    import spark.implicits._
    val texts = (1L to 50L).map(i => (i, s"doc $i " * (i.toInt % 13 + 1)))
    val a = TextAnalysis.compressionRatio(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = TextAnalysis.compressionRatio(
        texts.toDF("doc_id", "text").repartition(17))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("empty text reports ratio 1.0 and zero raw bytes") {
    val got = ratios((1L, ""))
    assert(got(1L)._1 === 0L)
    assert(got(1L)._3 === 1.0)
  }
}
