package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class FinewebFunnelSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("funnel stages are monotone and consistent on a built fixture") {
    import spark.implicits._
    def mk(id: Long, text: String, lang: String) =
      (id, text, lang, text.length.toLong)
    // 4-6 char words keep the gopher mean-word-length rule in range
    val good = ("the and " + (1 to 60).map(i => s"word$i").mkString(" "))
    val dupe = ("the and " + (1 to 60).map(i => s"verb$i").mkString(" "))
    val docs = Seq(
      mk(0L, good, "en"),              // survives everything
      mk(1L, dupe, "en"),              // survives (first copy)
      mk(2L, dupe, "en"),              // full duplicate: all chunks drop
      mk(3L, "the and of", "fr"),      // fails gopher (word count)
      // passes gopher, then loses most chunks to doc 1 and lands
      // under the 20-word floor: shares dupe's first 56 words (7
      // chunks), has 1 unique tail chunk of 6 words
      mk(4L, ("the and " + (1 to 54).map(i => s"verb$i").mkString(" ") +
        " " + (1 to 6).map(i => s"tail$i").mkString(" ")), "en"))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = FinewebFunnel.funnel(docs).orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val en = got.find(_._1 == "en").get
    val fr = got.find(_._1 == "fr").get
    assert(fr === (("fr", 1L, 0L, 0L, 0L, 0L)))
    assert(en._2 === 4L)        // raw
    assert(en._3 === 4L)        // all en docs pass gopher
    assert(en._4 === 3L)        // doc 2 loses every chunk
    assert(en._5 === 2L)        // doc 4 under the 20-word floor
    // words_final = doc0 (62) + doc1 (62)
    assert(en._6 === 124L)
  }

  test("funnel is monotone on the real corpus and words match survivors") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = FinewebFunnel.funnel(corpus).collect()
    rows.foreach { r =>
      val (raw, g, s, f) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= g && g >= s && s >= f)
    }
    assert(rows.map(_.getLong(1)).sum === corpus.count())
    assert(rows.map(_.getLong(4)).sum > 0) // something survives end-to-end
  }
}
