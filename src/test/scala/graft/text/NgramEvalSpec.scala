package graft.text

import org.apache.spark.sql.functions.{col, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

class NgramEvalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def run(docs: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    NgramEval.clippedOverlap(docs.toDF("doc_id", "text"), n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
  }

  test("clipping caps repeated grams at the reference multiplicity") {
    // the classic BLEU degenerate candidate: "the the the the" vs a
    // reference with two 'the the' bigrams' worth — candidate bigram
    // 'the the' ×3, reference ×1 → clipped = min(3, 1) = 1, not 3
    val out = run(Seq(
      0L -> "the the the the",      // candidate: 3 × 'the the'
      1L -> "the the cat sat"),     // reference: 1 × 'the the' + 2 others
      n = 2)
    val (clipped, cTotal, rTotal, prec, rec) = out(0L)
    assert(clipped === 1L && cTotal === 3L && rTotal === 3L)
    assert(prec === 1.0 / 3 && rec === 1.0 / 3)
  }

  test("hand-computed precision and recall on an overlapping pair") {
    // cand bigrams: [a b, b c, c d]; ref bigrams: [a b, b c, c x]
    // clipped = 2 → precision 2/3, recall 2/3; unigram: cand {a,b,c,d}
    // ref {a,b,c,x} → clipped 3, precision 3/4
    val docs = Seq(0L -> "a b c d", 1L -> "a b c x")
    val bi = run(docs, 2)(0L)
    assert(bi === ((2L, 3L, 3L, 2.0 / 3, 2.0 / 3)))
    val uni = run(docs, 1)(0L)
    assert(uni === ((3L, 4L, 4L, 3.0 / 4, 3.0 / 4)))
  }

  test("multiplicity counts on BOTH sides (not distinct-gram overlap)") {
    // 'x y' appears twice in cand and twice in ref → clipped 2 of 3
    val out = run(Seq(0L -> "x y x y x", 1L -> "x y x y z"), 2)(0L)
    assert(out._1 === 3L) // min(2,2) for 'x y' + min(2,1) for 'y x'
    assert(out._2 === 4L && out._3 === 4L)
  }

  test("pairs missing a side or below n words are dropped") {
    val out = run(Seq(
      0L -> "a b c", 1L -> "a b c",
      2L -> "only candidate here",     // doc 3 missing
      4L -> "a b c", 5L -> "x"),       // ref below n=2 words
      2)
    assert(out.keySet === Set(0L))
  }

  test("negative doc_ids pair by Euclidean parity on BOTH engines") {
    // pmod(-1, 2) = 1 in Spark; the SQL mirror spells ((x%2)+2)%2 so
    // DuckDB agrees (bare % returns -1 there) — pair (-2, -1) scores
    val out = run(Seq(-2L -> "a b c", -1L -> "a b x"), 2)
    assert(out.keySet === Set(-2L))
    assert(out(-2L)._1 === 1L) // 'a b' shared
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    val sql = NgramEval.clippedOverlapSql(2,
      "(SELECT * FROM (VALUES (-2, 'a b c'), (-1, 'a b x')) t(doc_id, text))")
    val duck = DuckBridgeTestUtil.duck(
      s"SELECT pair_id, clipped, c_total, r_total FROM ($sql) q")
    assert(duck === Seq(Seq(Some("-2"), Some("1"), Some("2"), Some("2"))))
  }

  test("bleu4: identical texts score exactly 0 (log2 BLEU = 0, BLEU = 1)") {
    import spark.implicits._
    val t = "a b c d e f g h"
    val out = NgramEval.bleu4(Seq(0L -> t, 1L -> t).toDF("doc_id", "text"))
      .head()
    // every precision is exact 1 (n=1 unsmoothed: cl=ct; n>=2 smoothed:
    // (cl+1)/(ct+1) with cl=ct) and c_len = r_len -> bp 0
    assert(out.getAs[Long]("bp_log2fp") === 0L)
    assert(out.getAs[Long]("bleu_log2fp_x4") === 0L)
    assert(out.getAs[Long]("c_len") === 8L && out.getAs[Long]("r_len") === 8L)
    assert(out.getAs[Long]("clipped_4") === 5L)
  }

  test("bleu4 equals the hand-composed FixedLog spelling") {
    import spark.implicits._
    import graft.util.FixedLog.log2fp
    // cand: 'a b c d e' (5 words), ref: 'a b c x y z' (6 words)
    // n=1: clipped 3 of 5; n=2: 2 of 4 (+1 smoothing -> 3/5);
    // n=3: 1 of 3 (-> 2/4); n=4: 0 of 2 (-> 1/3); c<r -> bp active
    val out = NgramEval.bleu4(
      Seq(0L -> "a b c d e", 1L -> "a b c x y z").toDF("doc_id", "text"))
      .head()
    assert((out.getAs[Long]("clipped_1"), out.getAs[Long]("clipped_2"),
      out.getAs[Long]("clipped_3"), out.getAs[Long]("clipped_4")) ===
      ((3L, 2L, 1L, 0L)))
    val expectedQ = log2fp(3, 5) + log2fp(3, 5) + log2fp(2, 4) + log2fp(1, 3)
    val expectedBp = -((6L - 5L) * (1L << 20) * 1000000L / (5L * 693147L))
    assert(out.getAs[Long]("bp_log2fp") === expectedBp)
    assert(out.getAs[Long]("bleu_log2fp_x4") === expectedQ + 4 * expectedBp)
  }

  test("bleu4: zero unigram overlap yields NULL score; short/one-sided pairs drop") {
    import spark.implicits._
    val out = NgramEval.bleu4(Seq(
      0L -> "a b c d", 1L -> "x y z w",     // no shared unigram -> NULL
      2L -> "a b c", 3L -> "a b c",         // candidate < 4 words -> dropped
      4L -> "a b c d e").toDF("doc_id", "text")) // missing reference -> dropped
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L))
    assert(out(0L).isNullAt(out(0L).fieldIndex("bleu_log2fp_x4")))
    assert(out(0L).getAs[Long]("clipped_1") === 0L)
  }

  test("bleu4Sql mirror matches the Spark side on a mixed mini-corpus") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    // identical pair, partial-overlap pair with length mismatch (bp
    // active), zero-unigram pair (NULL score), dropped short pair
    val docs = Seq(
      0L -> "a b c d e f", 1L -> "a b c d e f",
      2L -> "a b c d e", 3L -> "a b c x y z q",
      4L -> "p q r s", 5L -> "w x y z",
      6L -> "a b c", 7L -> "a b c")
    val gotSpark = NgramEval.bleu4(docs.toDF("doc_id", "text"))
      .collect().map { r =>
        r.getLong(0) -> (1 to 8).map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
    val values = docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val sql = NgramEval.bleu4Sql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")
    val gotDuck = DuckBridgeTestUtil.duck(sql)
      .map(r => r(0).get.toLong -> r.tail.map(_.map(_.toLong))).toMap
    assert(gotSpark.keySet === Set(0L, 2L, 4L))
    assert(gotDuck.keySet === gotSpark.keySet)
    gotSpark.foreach { case (p, cols) =>
      assert(gotDuck(p) === cols, s"pair $p")
    }
    assert(gotSpark(0L).last === Some(0L))  // identical -> BLEU = 1
    assert(gotSpark(4L).last === None)      // zero unigram overlap
  }

  private def multiRef(cands: Seq[(Long, String)],
      refs: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    NgramEval.bleu4MultiRef(
      cands.toDF("cand_id", "text"),
      refs.toDF("cand_id", "ref_id", "text"))
  }

  test("bleu4MultiRef with ONE reference reproduces bleu4 exactly") {
    import spark.implicits._
    val pairs = Seq(
      (0L, "a b c d e", "a b c x y z"),
      (2L, "a b c d e f", "a b c d e f"),
      (4L, "p q r s", "w x y z"))
    val single = NgramEval.bleu4(
      pairs.flatMap { case (id, c, r) => Seq(id -> c, (id + 1) -> r) }
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(r.fieldIndex("bleu_log2fp_x4"))) None
        else Some(r.getAs[Long]("bleu_log2fp_x4")),
        r.getAs[Long]("bp_log2fp"), r.getAs[Long]("r_len"))).toMap
    val multi = multiRef(
      pairs.map(p => p._1 -> p._2),
      pairs.map(p => (p._1, p._1 + 1, p._3)))
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(r.fieldIndex("bleu_log2fp_x4"))) None
        else Some(r.getAs[Long]("bleu_log2fp_x4")),
        r.getAs[Long]("bp_log2fp"), r.getAs[Long]("r_len"))).toMap
    assert(multi === single)
  }

  test("multi-ref clip takes the MAX gram count across references (Papineni)") {
    // cand 'the the cat': 'the'×2. ref A has 'the'×1, ref B 'the'×2 —
    // multi-ref clip for 'the' = min(2, max(1,2)) = 2; a single-ref
    // run against A alone would clip to 1
    val out = multiRef(
      Seq(0L -> "the the cat sat"),
      Seq((0L, 1L, "the cat sat x"), (0L, 2L, "the the dog sat"))).head()
    assert(out.getAs[Long]("clipped_1") === 4L) // the,the,cat,sat all covered
    assert(out.getAs[Long]("n_refs") === 2L)
    val single = multiRef(
      Seq(0L -> "the the cat sat"),
      Seq((0L, 1L, "the cat sat x"))).head()
    assert(single.getAs[Long]("clipped_1") === 3L)
  }

  test("effective reference length: closest to c_len, ties to the shorter") {
    // cand 4 words; refs of length 2 and 6 — both |diff| = 2, tie ->
    // shorter (2) -> bp active with r_len = 2? No: r_len 2 < c_len 4
    // -> bp = 0 (candidate longer). Assert r_len = 2 directly.
    val out = multiRef(
      Seq(0L -> "a b c d"),
      Seq((0L, 1L, "a b"), (0L, 2L, "a b c d e f"))).head()
    assert(out.getAs[Long]("r_len") === 2L)
    assert(out.getAs[Long]("bp_log2fp") === 0L)
    // closest wins when not tied: lengths 5 and 9 vs c_len 4 -> 5
    val out2 = multiRef(
      Seq(0L -> "a b c d"),
      Seq((0L, 1L, "a b c d e"), (0L, 2L, "a b c d e f g h i"))).head()
    assert(out2.getAs[Long]("r_len") === 5L)
    assert(out2.getAs[Long]("bp_log2fp") < 0L) // r > c -> penalty
  }

  test("multi-ref: candidates without references (or <4 words) drop") {
    val out = multiRef(
      Seq(0L -> "a b c d", 4L -> "has no refs here", 8L -> "a b c"),
      Seq((0L, 1L, "a b c d"), (8L, 9L, "a b c"))).collect()
      .map(_.getLong(0)).toSet
    assert(out === Set(0L))
  }

  test("bleu4MultiRefSql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    val cands = Seq((0L, "a b c d e"), (4L, "the the cat sat"))
    val refs = Seq(
      (0L, 1L, "a b c x y z"), (0L, 2L, "a b c d q"),
      (4L, 5L, "the cat sat x"), (4L, 6L, "the the dog sat"))
    val gotSpark = multiRef(cands, refs)
      .collect().map { r =>
        r.getLong(0) -> (1 until r.length).map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
    val cv = cands.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
    val rv = refs.map { case (c, i, t) => s"($c, $i, '$t')" }.mkString(", ")
    val sql = NgramEval.bleu4MultiRefSql(
      candsFrom = s"(SELECT * FROM (VALUES $cv) t(cand_id, text))",
      refsFrom = s"(SELECT * FROM (VALUES $rv) t(cand_id, ref_id, text))")
    val gotDuck = DuckBridgeTestUtil.duck(sql)
      .map(r => r(0).get.toLong -> r.tail.map(_.map(_.toLong))).toMap
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
  }

  test("chrF: identical texts score exactly 1e6; clipping and the F-beta algebra pin") {
    import spark.implicits._
    val t = "abcdefgh ij"
    val same = NgramEval.chrF(Seq(0L -> t, 1L -> t).toDF("doc_id", "text"))
      .head()
    assert(same.getAs[Long]("chrf_e6") === 1000000L)
    assert(same.getAs[Long]("c_chars") === 10L) // space stripped
    // hand case: cand 'abcdef' (6 chars), ref 'abcxyz' — order n:
    // clipped_n = max(0, 4-n) (the shared 'abc' prefix), c_tot = r_tot
    // = 7-n, F_n = 5*clip/(4*(7-n) + (7-n)) = clip/(7-n)
    val out = NgramEval.chrF(
      Seq(0L -> "abcdef", 1L -> "abcxyz").toDF("doc_id", "text")).head()
    assert(out.getAs[Long]("clipped_1") === 3L)
    assert(out.getAs[Long]("clipped_6") === 0L)
    val expected = (1 to 6).map { n =>
      val clip = math.max(0, 4 - n).toLong
      5L * clip * 1000000L / (4L * (7 - n) + (7 - n))
    }.sum / 6
    assert(out.getAs[Long]("chrf_e6") === expected)
    // multiplicity clipping: 'aaaa' vs 'aa' — unigram clipped = 2 not 4
    val clip = NgramEval.chrF(Seq(0L -> "aaaa", 1L -> "aaabbb")
      .toDF("doc_id", "text"), maxN = 2).head()
    assert(clip.getAs[Long]("clipped_1") === 3L) // min(4, 3) 'a's
  }

  test("chrF: pairs with a side shorter than maxN chars drop; mirror parity") {
    import spark.implicits._
    val docs = Seq(
      0L -> "abcdefgh", 1L -> "abcdxyzw",  // full-order pair
      2L -> "abcdefgh", 3L -> "abc",       // ref < 6 chars -> dropped
      4L -> "ab cd ef", 5L -> "ab cd ef")  // spaces stripped -> 6 chars, kept
    val gotSpark = NgramEval.chrF(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (1 until r.length).map(r.getLong)).toMap
    assert(gotSpark.keySet === Set(0L, 4L))
    assert(gotSpark(4L).last === 1000000L)
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    val values = docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(NgramEval.chrFSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong)).toMap
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
  }

  test("chrF++: identity 1e6; word orders genuinely participate; <2-word sides drop") {
    import spark.implicits._
    val t = "the cat sat"
    val same = NgramEval.chrFpp(Seq(0L -> t, 1L -> t).toDF("doc_id", "text"))
      .head()
    assert(same.getAs[Long]("chrfpp_e6") === 1000000L)
    assert(same.getAs[Long]("c_words") === 3L)
    assert(same.getAs[Long]("c_chars") === 9L)
    // same characters, different word segmentation: char orders agree,
    // word orders must NOT — chrF++ < 1e6 while plain chrF = 1e6
    val seg = Seq(0L -> "ab cdef", 1L -> "abc def")
    val chrf = NgramEval.chrF(seg.toDF("doc_id", "text")).head()
    assert(chrf.getAs[Long]("chrf_e6") === 1000000L)
    val pp = NgramEval.chrFpp(seg.toDF("doc_id", "text")).head()
    assert(pp.getAs[Long]("chrfpp_e6") < 1000000L)
    assert(pp.getAs[Long]("clipped_w2") === 0L)
    // a one-word side has no word bigram -> component unpopulated -> drop
    val out = NgramEval.chrFpp(Seq(
      0L -> "abcdefgh xy", 1L -> "abcdefgh").toDF("doc_id", "text"))
      .collect()
    assert(out.isEmpty)
  }

  test("chrFppSql mirror matches the Spark side (astral chars included)") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "the cat sat on mats", 1L -> "the cat sat on mat",
      2L -> "𝄞ab cd𝄞ef gh", 3L -> "𝄞ab xy𝄞ef gh",
      4L -> "abcdef gh", 5L -> "abc")
    val gotSpark = NgramEval.chrFpp(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (1 until r.length).map(r.getLong)).toMap
    val values = docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(NgramEval.chrFppSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong)).toMap
    assert(gotSpark.keySet === Set(0L, 2L))
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
  }

  test("bleu4Corpus: micro average — corpus counts sum BEFORE the ratio") {
    import spark.implicits._
    import graft.util.FixedLog.log2fp
    // two pairs; per-order corpus counts are the sums of the per-pair
    // clipped/total counts, and the score composes from THOSE (not a
    // mean of per-pair scores)
    val docs = Seq(
      0L -> "a b c d e", 1L -> "a b c x y z",
      2L -> "p q r s", 3L -> "p q r s w",
      4L -> "only candidate here ok", // no ref -> excluded entirely
      7L -> "only reference")         // no cand -> excluded
    val out = NgramEval.bleu4Corpus(docs.toDF("doc_id", "text")).head()
    assert(out.getAs[Long]("n_pairs") === 2L)
    // pair0: clipped (3,2,1,0), totals (5,4,3,2); pair2: (4,3,2,1)/(4,3,2,1)
    assert(out.getAs[Long]("clipped_1") === 7L)
    assert(out.getAs[Long]("clipped_4") === 1L)
    assert(out.getAs[Long]("c_len") === 9L && out.getAs[Long]("r_len") === 11L)
    val q = log2fp(7, 9) + log2fp(5, 7) + log2fp(3, 5) + log2fp(1, 3)
    val bp = -((11L - 9L) * (1L << 20) * 1000000L / (9L * 693147L))
    assert(out.getAs[Long]("bleu_log2fp_x4") === q + 4 * bp)
    // identical corpus scores exactly 0 (BLEU = 1), raw counts
    val t = "a b c d e f"
    val same = NgramEval.bleu4Corpus(
      Seq(0L -> t, 1L -> t).toDF("doc_id", "text")).head()
    assert(same.getAs[Long]("bleu_log2fp_x4") === 0L)
    // zero corpus-wide 4-gram overlap -> NULL (raw counts, no smoothing)
    val nul = NgramEval.bleu4Corpus(Seq(
      0L -> "a b c d e", 1L -> "a b c x d q e w").toDF("doc_id", "text"))
      .head()
    assert(nul.isNullAt(nul.fieldIndex("bleu_log2fp_x4")))
  }

  test("bleu4CorpusSql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "a b c d e", 1L -> "a b c x y z",
      2L -> "p q r s", 3L -> "p q r s w",
      4L -> "one sided cand x")
    val s = NgramEval.bleu4Corpus(docs.toDF("doc_id", "text")).head()
    val gotSpark = (0 until s.length).map(i =>
      if (s.isNullAt(i)) None else Some(s.getLong(i)))
    val values = docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val duck = DuckBridgeTestUtil.duck(NgramEval.bleu4CorpusSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
      .map(_.map(_.toLong))
    assert(duck === gotSpark)
  }

  test("tokenF1: bag F1 with exact-match as a separate SEQUENCE-sensitive bit") {
    import spark.implicits._
    val out = NgramEval.tokenF1(Seq(
      0L -> "a b c", 1L -> "a b c",    // identical: f1 1e6, em 1
      2L -> "a b", 3L -> "b a",        // same bag, different order: f1 1e6, em 0
      4L -> "a b c", 5L -> "a x",      // partial: clipped 1, f1 2/5
      6L -> "the the x", 7L -> "the y z" // multiplicity: min(2,1)+0 = 1
    ).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("token_f1_e6"), r.getAs[Long]("exact_match"),
          r.getAs[Long]("clipped"))).toMap
    assert(out(0L) === ((1000000L, 1L, 3L)))
    assert(out(2L) === ((1000000L, 0L, 2L)))
    assert(out(4L) === ((400000L, 0L, 1L)))
    assert(out(6L) === ((2L * 1L * 1000000L / 6L, 0L, 1L)))
  }

  test("tokenF1Sql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "a b c", 1L -> "a b c",
      2L -> "a b", 3L -> "b a",
      4L -> "the the cat", 5L -> "the dog",
      6L -> "unpaired")
    val gotSpark = NgramEval.tokenF1(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (1 until r.length).map(r.getLong)).toMap
    val values = docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(NgramEval.tokenF1Sql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong)).toMap
    assert(gotSpark.keySet === Set(0L, 2L, 4L))
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
  }

  test("pairCoverage: pairs_scored equals each gate's ACTUAL row count") {
    import spark.implicits._
    // one pair per drop regime: full-scoring, cand < 4 words, side
    // < 6 chars, 1-word side (word-bigram drop), one-sided, empty
    // text, NULL ref, plus a > 40-word / > 40-char pair so the DP
    // gates' truncation column is exercised
    val docs = Seq(
      0L -> "the cat sat on the mat", 1L -> "a cat sat on a mat",
      2L -> "two words xx", 3L -> "reference side here is fine",
      4L -> "abc", 5L -> "abcdefgh",
      6L -> "oneword123", 7L -> "wordone456",
      8L -> "unpaired text", // 9 missing
      10L -> "", 11L -> "x y z w q",
      12L -> "valid candidate side here", 13L -> null, // NULL ref
      14L -> (1 to 45).map(i => s"t$i").mkString(" "),
      15L -> "short reference side"
    ).toDF("doc_id", "text")
    val cov = NgramEval.pairCoverage(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val pairGates = Set("eval_ngram_overlap", "eval_bleu4",
      "eval_bleu4_corpus", "eval_cer", "eval_cer_corpus", "eval_chrf",
      "eval_chrf_corpus", "eval_chrf_reduced", "eval_chrfpp",
      "eval_chrfpp_corpus", "eval_rouge_l", "eval_rouge_n",
      "eval_token_f1", "eval_wer", "eval_wer_corpus")
    val quadGates = Set("eval_bleu4_multiref", "eval_bleu4_paired_bs",
      "eval_chrf_multiref", "eval_chrf_paired_bs", "eval_chrfpp_multiref",
      "eval_rouge_l_multiref", "eval_rouge_n_multiref",
      "eval_token_f1_multiref", "eval_wer_multiref")
    assert(cov.keySet === pairGates ++ quadGates)
    // the gate data shape: mod-4 cands and refs (DocQueries pairing)
    val cands = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      .select(col("doc_id").as("cand_id"), col("text"))
    val refs = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      .select((col("doc_id") - pmod(col("doc_id"), lit(4))).as("cand_id"),
        col("doc_id").as("ref_id"), col("text"))
    val actual = Map(
      "eval_ngram_overlap" -> NgramEval.clippedOverlap(docs).count(),
      "eval_bleu4" -> NgramEval.bleu4(docs).count(),
      // corpus faces are one row; their own n_pairs/n_quads columns
      // ARE the scored counts
      "eval_bleu4_corpus" ->
        NgramEval.bleu4Corpus(docs).head().getAs[Long]("n_pairs"),
      "eval_bleu4_multiref" -> NgramEval.bleu4MultiRef(cands, refs).count(),
      "eval_bleu4_paired_bs" -> NgramEval.bleu4PairedBootstrap(docs, b = 10)
        .head().getAs[Long]("n_quads"),
      "eval_cer" -> Wer.cer(docs).count(),
      "eval_cer_corpus" ->
        Wer.cerCorpus(docs).head().getAs[Long]("n_pairs"),
      "eval_chrf" -> NgramEval.chrF(docs).count(),
      "eval_chrf_multiref" -> MultiRefEval.chrF(cands, refs).count(),
      "eval_chrf_paired_bs" -> NgramEval.chrFPairedBootstrap(docs, b = 10)
        .head().getAs[Long]("n_quads"),
      "eval_chrf_corpus" ->
        NgramEval.chrFCorpus(docs).head().getAs[Long]("n_pairs"),
      "eval_chrf_reduced" -> NgramEval.chrFReduced(docs).count(),
      "eval_chrfpp" -> NgramEval.chrFpp(docs).count(),
      "eval_chrfpp_corpus" ->
        NgramEval.chrFppCorpus(docs).head().getAs[Long]("n_pairs"),
      "eval_chrfpp_multiref" -> MultiRefEval.chrFpp(cands, refs).count(),
      "eval_rouge_l" -> RougeL.rougeL(docs).count(),
      "eval_rouge_l_multiref" -> MultiRefEval.rougeL(cands, refs).count(),
      "eval_rouge_n" -> RougeL.rougeN(docs).count(),
      "eval_rouge_n_multiref" -> MultiRefEval.rougeN(cands, refs).count(),
      "eval_token_f1" -> NgramEval.tokenF1(docs).count(),
      "eval_token_f1_multiref" -> MultiRefEval.tokenF1(cands, refs).count(),
      "eval_wer" -> Wer.wer(docs).count(),
      "eval_wer_multiref" -> MultiRefEval.wer(cands, refs).count(),
      "eval_wer_corpus" ->
        Wer.werCorpus(docs).head().getAs[Long]("n_pairs"))
    actual.foreach { case (m, n) =>
      assert(cov(m)._2 === n, s"$m pairs_scored vs gate rows")
      val total = if (pairGates(m)) 8L else 4L // 8 pairs / 4 quads
      assert(cov(m)._1 === total, s"$m pairs_total")
      assert(cov(m)._3 === total - n, s"$m pairs_dropped")
      assert(cov(m)._4 <= cov(m)._2, s"$m truncated <= scored")
    }
    // truncation: exactly the 45-word (89-char) pair 14/15, which is
    // also quad 12's reference side; gram metrics never truncate
    assert(cov("eval_rouge_l")._4 === 1L)
    assert(cov("eval_wer")._4 === 1L)
    assert(cov("eval_wer_corpus")._4 === 1L)
    assert(cov("eval_cer")._4 === 1L)
    assert(cov("eval_cer_corpus")._4 === 1L)
    assert(cov("eval_rouge_l_multiref")._4 === 1L)
    assert(cov("eval_wer_multiref")._4 === 1L)
    (pairGates ++ quadGates -- Set("eval_rouge_l", "eval_wer",
      "eval_wer_corpus", "eval_cer", "eval_cer_corpus",
      "eval_rouge_l_multiref", "eval_wer_multiref")).foreach { m =>
      assert(cov(m)._4 === 0L, s"$m must not truncate") }
    // the regimes genuinely differ (the ledger isn't vacuous)
    assert(actual.values.toSet.size >= 3)
  }

  test("disjoint texts score zero with exact totals") {
    val out = run(Seq(0L -> "a b c", 1L -> "x y z"), 2)(0L)
    assert(out === ((0L, 2L, 2L, 0.0, 0.0)))
  }

  test("chrFReduced: populated-orders mean; full-length pairs equal eval_chrf") {
    import spark.implicits._
    val docs = Seq(
      0L -> "abcdefgh stuv", 1L -> "abcdefgh wxyz",  // >= 6 chars: both gates
      2L -> "abc", 3L -> "abd",                      // 3 chars: reduced only
      4L -> "only one side").toDF("doc_id", "text")
    val red = NgramEval.chrFReduced(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("chrf_e6"))).toMap
    // the short pair scores on its 3 populated orders instead of dropping
    assert(red.keySet === Set(0L, 2L))
    assert(red(2L)._1 === 3L)
    // 'abc' vs 'abd': order 1 clipped 2 -> F = 5*2e6/(4*3+3) = 666666;
    // order 2 clipped 1 ('ab') -> 5*1e6/10 = 500000; order 3 -> 0;
    // mean over the 3 populated orders = 1166666 div 3 = 388888
    assert(red(2L)._2 === 388888L)
    // a pair satisfying the FULL contract scores identically in both
    val full = NgramEval.chrF(docs).head()
    assert(red(0L)._1 === 6L && red(0L)._2 === full.getAs[Long]("chrf_e6"))

    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    val values = "(0, 'abcdefgh stuv'), (1, 'abcdefgh wxyz'), " +
      "(2, 'abc'), (3, 'abd'), (4, 'only one side')"
    val duck = DuckBridgeTestUtil.duck(NgramEval.chrFReducedSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong ->
        (r(3).get.toLong, r(4).get.toLong)).toMap
    assert(duck === red)
  }

  test("chrFCorpus: counts sum across pairs BEFORE the ratio (micro, not macro)") {
    import spark.implicits._
    val docs = Seq(
      0L -> "abcdefgh", 1L -> "abcdefgh",  // identity, all 6 orders
      2L -> "abc", 3L -> "abd",            // 3 chars: orders 1-3 only
      4L -> "lonely").toDF("doc_id", "text")
    val row = NgramEval.chrFCorpus(docs).head()
    assert(row.getAs[Long]("n_pairs") === 2L)
    assert(row.getAs[Long]("c_chars") === 11L)
    assert(row.getAs[Long]("r_chars") === 11L)
    assert(row.getAs[Long]("n_orders") === 6L)
    // corpus sums per order: n1 (10,11,11) F=50e6/55=909090; n2 (8,9,9)
    // F=40e6/45=888888; n3 (6,7,7) F=30e6/35=857142; n4-6 from the
    // identity pair alone F=1e6 -> mean = 5655120/6 = 942520.
    // The short pair RAISED nothing it shouldn't: a macro mean of
    // per-pair chrF could not even score pair (2,3).
    assert(row.getAs[Long]("chrf_e6") === 942520L)
    // a single full-contract pair: corpus micro == the per-pair gate
    val solo = docs.filter(col("doc_id") < 2)
    assert(NgramEval.chrFCorpus(solo).head().getAs[Long]("chrf_e6") ===
      NgramEval.chrF(solo).head().getAs[Long]("chrf_e6"))
  }

  test("chrFCorpusSql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "abcdefgh stuv", 1L -> "abcdefgh wxyz",
      2L -> "abc", 3L -> "abd",
      4L -> "", 5L -> "empty cand side",
      6L -> "cand with null ref", 7L -> null)
    val sp = NgramEval.chrFCorpus(docs.toDF("doc_id", "text")).head()
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val du = DuckBridgeTestUtil.duck(NgramEval.chrFCorpusSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
    assert(du.map(_.get.toLong) === (0 until 5).map(sp.getLong))
    assert(sp.getAs[Long]("n_pairs") === 2L) // empty/NULL sides dropped
  }

  test("chrFppCorpus: micro over 8 components; solo full pair equals chrFpp") {
    import spark.implicits._
    val full = Seq(
      0L -> "the quick brown fox jumps", 1L -> "the quick brown dog jumps")
    val docs = (full ++ Seq(2L -> "ab cd", 3L -> "ab ce"))
      .toDF("doc_id", "text")
    val row = NgramEval.chrFppCorpus(docs).head()
    assert(row.getAs[Long]("n_pairs") === 2L)
    // char totals strip spaces: 21 + 4 per side; word unigrams 5 + 2
    assert(row.getAs[Long]("c_chars") === 25L)
    assert(row.getAs[Long]("r_chars") === 25L)
    assert(row.getAs[Long]("c_words") === 7L)
    assert(row.getAs[Long]("r_words") === 7L)
    assert(row.getAs[Long]("n_orders") === 8L)
    // a single full-contract pair: corpus micro == the per-pair gate
    val solo = full.toDF("doc_id", "text")
    assert(NgramEval.chrFppCorpus(solo).head().getAs[Long]("chrfpp_e6") ===
      NgramEval.chrFpp(solo).head().getAs[Long]("chrfpp_e6"))
  }

  test("chrFppCorpusSql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "the quick brown fox jumps", 1L -> "the quick brown dog jumps",
      2L -> "ab cd", 3L -> "ab ce",
      4L -> "one side only", 5L -> null)
    val sp = NgramEval.chrFppCorpus(docs.toDF("doc_id", "text")).head()
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val du = DuckBridgeTestUtil.duck(NgramEval.chrFppCorpusSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
    assert(du.map(_.get.toLong) === (0 until 7).map(sp.getLong))
  }

  test("chrFPairedBootstrap: ties on identical systems; better system wins; mirror") {
    import spark.implicits._
    // identical systems -> every replicate delta exactly 0
    val tied = (0 until 5).flatMap { q =>
      val base = q * 4L
      Seq(base -> s"the quick fox number $q jumps high",
        (base + 1) -> s"the quick fox number $q jumped highest",
        (base + 2) -> s"the quick fox number $q jumps high",
        (base + 3) -> "unused slot")
    }
    val t = NgramEval.chrFPairedBootstrap(
      tied.toDF("doc_id", "text"), b = 50).head()
    assert(t.getAs[Long]("n_quads") === 5L)
    assert(t.getAs[Long]("delta_full") === 0L)
    assert(t.getAs[Long]("wins_a") === 0L && t.getAs[Long]("wins_b") === 0L)
    assert(t.getAs[Long]("ties") === t.getAs[Long]("n_boot"))
    // sys A verbatim, sys B one word wrong -> A wins every replicate
    val skew = (0 until 6).flatMap { q =>
      val base = q * 4L
      val ref = s"alpha bravo charlie delta echo foxtrot golf q$q"
      Seq(base -> ref, (base + 1) -> ref,
        (base + 2) -> s"alpha bravo charlie delta echo foxtrot golf wrong$q")
    }
    val k = NgramEval.chrFPairedBootstrap(
      skew.toDF("doc_id", "text"), b = 50).head()
    assert(k.getAs[Long]("chrf_a") === 1000000L) // verbatim -> exact 1
    assert(k.getAs[Long]("delta_full") > 0L)
    assert(k.getAs[Long]("wins_a") === k.getAs[Long]("n_boot"))
    assert(k.getAs[Long]("delta_lo") > 0L)
    // mirror on a mixed fixture (incomplete quad + NULL ref excluded)
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    val docs: Seq[(Long, String)] = Seq(
      0L -> "the cat sat on the mat near the door",
      1L -> "the cat sat on the mat by the door",
      2L -> "a cat is sitting on the mat there now",
      4L -> "pack my box with five dozen liquor jugs",
      5L -> "pack my box with six dozen liquor jugs",
      6L -> "pack my box with five dozen liquor jugs",
      8L -> "quads need all three sides to count in",
      12L -> "this quad has a null reference side xx",
      13L -> null,
      14L -> "so it is excluded from the test set yy")
    val values = docs.map { case (id, tx) =>
      if (tx == null) s"($id, NULL)" else s"($id, '$tx')" }.mkString(", ")
    val s = NgramEval.chrFPairedBootstrap(
      docs.toDF("doc_id", "text"), b = 30).head()
    val d = DuckBridgeTestUtil.duck(NgramEval.chrFPairedBootstrapSql(b = 30,
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
    assert(s.getAs[Long]("n_quads") === 2L)
    (0 until s.length).foreach { i =>
      assert(d(i).map(_.toLong) ===
        Option(s.get(i)).map(_.asInstanceOf[Long]),
        s"column ${s.schema(i).name}")
    }
  }

  test("bleu4PairedBootstrap: identical systems tie on every replicate") {
    import spark.implicits._
    // slot 0 = sys A cand, 1 = shared ref, 2 = sys B cand, 3 unused;
    // A and B identical -> every replicate delta is exactly 0
    val docs = (0 until 5).flatMap { q =>
      val base = q * 4L
      Seq(base -> s"the quick fox number $q jumps high",
        (base + 1) -> s"the quick fox number $q jumped highest",
        (base + 2) -> s"the quick fox number $q jumps high",
        (base + 3) -> "unused slot")
    }
    val out = NgramEval.bleu4PairedBootstrap(
      docs.toDF("doc_id", "text"), b = 50).head()
    assert(out.getAs[Long]("n_quads") === 5L)
    assert(out.getAs[Long]("delta_full") === 0L)
    assert(out.getAs[Long]("wins_a") === 0L)
    assert(out.getAs[Long]("wins_b") === 0L)
    assert(out.getAs[Long]("ties") === out.getAs[Long]("n_boot"))
    assert(out.getAs[Long]("delta_lo") === 0L)
    assert(out.getAs[Long]("delta_hi") === 0L)
  }

  test("bleu4PairedBootstrap: the better system wins decisively") {
    import spark.implicits._
    // sys A copies the reference verbatim; sys B gets the last word
    // wrong — scoreable at every order (corpus clipped_4 > 0) but
    // strictly worse on every quad
    val docs = (0 until 6).flatMap { q =>
      val base = q * 4L
      val ref = s"alpha bravo charlie delta echo foxtrot golf q$q"
      Seq(base -> ref, (base + 1) -> ref,
        (base + 2) -> s"alpha bravo charlie delta echo foxtrot golf wrong$q")
    }
    val out = NgramEval.bleu4PairedBootstrap(
      docs.toDF("doc_id", "text"), b = 50).head()
    assert(out.getAs[Long]("delta_full") > 0L)
    assert(out.getAs[Long]("wins_a") === out.getAs[Long]("n_boot"))
    assert(out.getAs[Long]("wins_b") === 0L)
    // the whole CI sits above zero -> significant at the CI level
    assert(out.getAs[Long]("delta_lo") > 0L)
  }

  test("bleu4PairedBootstrapSql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    // mixed-quality systems so replicate deltas vary in sign; one
    // incomplete quad (no sys B) and one NULL ref exercise inclusion
    val docs: Seq[(Long, String)] = Seq(
      0L -> "the cat sat on the mat near the door",
      1L -> "the cat sat on the mat by the door",
      2L -> "a cat is sitting on the mat there now",
      4L -> "pack my box with five dozen liquor jugs",
      5L -> "pack my box with six dozen liquor jugs",
      6L -> "pack my box with five dozen liquor jugs",
      8L -> "quads need all three sides to count in",
      12L -> "this quad has a null reference side xx",
      13L -> null,
      14L -> "so it is excluded from the test set yy")
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val s = NgramEval.bleu4PairedBootstrap(
      docs.toDF("doc_id", "text"), b = 30).head()
    val d = DuckBridgeTestUtil.duck(NgramEval.bleu4PairedBootstrapSql(b = 30,
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
    assert(s.getAs[Long]("n_quads") === 2L) // quads 0 and 4 only
    (0 until s.length).foreach { i =>
      assert(d(i).map(_.toLong) ===
        Option(s.get(i)).map(_.asInstanceOf[Long]),
        s"column ${s.schema(i).name}")
    }
  }
}
