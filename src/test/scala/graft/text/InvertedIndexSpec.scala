package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("planted corpus: postings, df and tf_total match brute force") {
    val d = Seq(
      (1L, "a b a c"),
      (2L, "b c c"),
      (3L, "a"),
      (4L, "d d d d")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(d, headN = 2).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(idx("a") === ((2L, 3L, "1,3")))
    assert(idx("b") === ((2L, 2L, "1,2")))
    assert(idx("c") === ((2L, 3L, "1,2")))
    assert(idx("d") === ((1L, 4L, "4")))
    assert(idx.size === 4)
  }

  test("head cap binds on the real corpus without touching df/tf") {
    val idx = InvertedIndex.build(docs, headN = 5)
    val bad = idx.filter(size(split(col("postings_head"), ",")) > 5).count()
    assert(bad === 0L)
    // df larger than the cap proves the cap actually binds somewhere
    assert(idx.filter(col("df") > 5).count() > 0L)
    // postings are sorted ascending and unique
    idx.collect().foreach { r =>
      val ids = r.getAs[String]("postings_head").split(",").map(_.toLong)
      assert(ids.toSeq === ids.sorted.toSeq.distinct)
      assert(r.getAs[Long]("tf_total") >= r.getAs[Long]("df"))
    }
  }
}
