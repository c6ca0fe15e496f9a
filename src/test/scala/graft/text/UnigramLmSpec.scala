package graft.text

import org.scalatest.funsuite.AnyFunSuite

class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def toyDocs = Seq(
    (1L, "low low low lower lower newest newest newest newest widest"),
    (2L, "low lower newest widest widest newest low newest"),
    (3L, "the newest of the newest low lower the widest"))
    .toDF("doc_id", "text")

  test("viterbi: picks the highest-scoring segmentation with fewer-pieces tiebreak") {
    val score = Map("ab" -> -10L, "a" -> -8L, "b" -> -8L, "abc" -> -15L,
      "c" -> -8L)
    // "abc": [abc]=-15 beats [ab,c]=-18 and [a,b,c]=-24
    assert(UnigramLm.viterbi("abc", score, 4) == List("abc"))
    // "ab": [ab]=-10 beats [a,b]=-16
    assert(UnigramLm.viterbi("ab", score, 4) == List("ab"))
    // equal scores → fewer pieces: make [ab] tie [a,b]
    val tied = Map("ab" -> -16L, "a" -> -8L, "b" -> -8L)
    assert(UnigramLm.viterbi("ab", tied, 4) == List("ab"))
  }

  test("coverage: every corpus word segments and concatenates back (roundtrip)") {
    val model = UnigramLm.train(toyDocs, vocabSize = 20, maxPieceLen = 4,
      iters = 2, seedSize = 50)
      .select("piece", "q9_logp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = UnigramLm.wordCounts(toyDocs).select("word")
      .as[String].collect()
    words.foreach { w =>
      val pieces = UnigramLm.viterbi(w, model, 4)
      assert(pieces.mkString("") == w, s"lossless segmentation of '$w'")
      assert(pieces.forall(model.contains), s"all pieces in vocab for '$w'")
    }
  }

  test("frequent whole words become single pieces") {
    val model = UnigramLm.train(toyDocs, vocabSize = 20, maxPieceLen = 6,
      iters = 3, seedSize = 100)
      .select("piece", "q9_logp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'newest' dominates the corpus → must be a vocab piece and its own
    // segmentation
    assert(model.contains("newest"))
    assert(UnigramLm.viterbi("newest", model, 6) == List("newest"))
  }

  test("training is invariant to input partitioning") {
    val a = UnigramLm.train(toyDocs.repartition(1), 20, 4, 2, 50)
      .collect().map(_.toSeq)
    val b = UnigramLm.train(toyDocs.repartition(7), 20, 4, 2, 50)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("viterbi DP equals enumeration under (score, pieces, rev-bounds) order") {
    // The DuckDB oracle for pipeline_unigram_encode enumerates all
    // 2^(n-1) cut masks and ranks by score DESC, piece count ASC,
    // reversed cut positions DESC; this pins that total order to the
    // DP's nested latest-final-cut tie-break, over tie-heavy random
    // models (scores proportional to length so segmentations collide).
    val rnd = new scala.util.Random(7)
    val alpha = "ab"
    for (_ <- 1 to 200) {
      val pieces = (alpha.map(_.toString) ++
        (1 to 12).map(_ => (1 to (2 + rnd.nextInt(3))).map(_ =>
          alpha(rnd.nextInt(2))).mkString)).distinct
      val score: Map[String, Long] =
        pieces.map(p => p -> (-100L * (1 + rnd.nextInt(2)) * p.length)).toMap
      val w = (1 to (1 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(2))).mkString
      val dp = UnigramLm.viterbi(w, score, 4)
      // enumeration reference
      val n = w.length
      val cands = (0 until (1 << (n - 1))).flatMap { mask =>
        val bounds = 0 +: (1 until n).filter(i => ((mask >> (i - 1)) & 1) == 1) :+ n
        val ps = bounds.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toList
        if (ps.forall(p => p.length <= 4 && score.contains(p)))
          Some((ps.map(score).sum, ps.length, bounds.reverse, ps))
        else None
      }
      val best = cands.sortBy { case (s, np, rb, _) =>
        (-s, np, rb.map(-_).toList: Seq[Int]) }(
        Ordering.Tuple3(Ordering.Long, Ordering.Int,
          Ordering.Implicits.seqOrdering[Seq, Int])).head._4
      assert(dp === best, s"word=$w")
    }
  }

  test("encode: digest face is deterministic and counts pieces") {
    val model = UnigramLm.train(toyDocs, 20, 4, 2, 50)
      .select("piece", "q9_logp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enc = UnigramLm.encode(toyDocs, model, 4)
      .orderBy("doc_id").collect()
    assert(enc.length == 3)
    assert(enc.forall(_.getLong(1) > 0))
    val enc2 = UnigramLm.encode(toyDocs.repartition(5), model, 4)
      .orderBy("doc_id").collect()
    assert(enc.map(_.toSeq).toSeq == enc2.map(_.toSeq).toSeq)
  }
}
