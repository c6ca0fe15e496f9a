package graft.text

import org.scalatest.funsuite.AnyFunSuite

class WerSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Classic full-table Levenshtein to pin the two-row kernel. */
  private def refLev(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = i
    for (j <- 0 to b.length) dp(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1)
    dp(a.length)(b.length)
  }

  test("levLen matches the full-table reference on random token lists") {
    val rnd = new scala.util.Random(41)
    val vocab = Array("a", "b", "c", "d")
    for (trial <- 1 to 300) {
      val a = Array.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
      val b = Array.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
      assert(Wer.levLen(a, b) === refLev(a.toSeq, b.toSeq), s"trial $trial")
    }
    assert(Wer.levLen(Array.empty, Array("a", "b")) === 2)
    assert(Wer.levLen(Array("a", "b"), Array.empty) === 2)
  }

  test("identity scores 0; substitutions/insertions/deletions count; WER can exceed 1e6") {
    import spark.implicits._
    val out = Wer.wer(Seq(
      0L -> "the cat sat", 1L -> "the cat sat",      // 0 edits
      2L -> "the cat sat", 3L -> "the dog sat",      // 1 subst
      4L -> "a b c d e f", 5L -> "x y",              // 2 subst + 4 del -> 6/2 = 3e6
      6L -> "one sided only").toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("edits"), r.getAs[Long]("wer_e6"))).toMap
    assert(out.keySet === Set(0L, 2L, 4L))
    assert(out(0L) === ((0L, 0L)))
    assert(out(2L) === ((1L, 1000000L / 3L)))
    assert(out(4L) === ((6L, 3000000L)))
  }

  test("werSql mirror matches the Spark side row-for-row (cap + NULL side)") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "a b c d e f g h", 1L -> "a x c d q f g w",
      2L -> "same here", 3L -> "same here",
      4L -> "p q r s t u v w x y", 5L -> "y x w v u t s r q p",
      6L -> "cand with null ref", 7L -> null)
    val gotSpark = Wer.wer(docs.toDF("doc_id", "text"), cap = 6)
      .collect().map(r => r.getLong(0) ->
        (1 until 5).map(r.getLong)).toMap
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(Wer.werSql(cap = 6,
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong)).toMap
    assert(gotSpark.keySet === Set(0L, 2L, 4L))
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
    assert(gotSpark(2L)(2) === 0L)
  }

  test("cer: identity 0; spaces count; astral codepoints are ONE symbol; empty sides drop") {
    import spark.implicits._
    val out = Wer.cer(Seq(
      0L -> "abc", 1L -> "abc",            // identity -> 0
      2L -> "a c", 3L -> "abc",            // space vs 'b': 1 subst / 3
      4L -> "𝄞x", 5L -> "x",    // astral+x vs x: 1 del / 1 -> 1e6
      6L -> "", 7L -> "nonempty",          // empty cand -> dropped
      8L -> "lonely").toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("c_len"), r.getAs[Long]("r_len"),
          r.getAs[Long]("edits"), r.getAs[Long]("cer_e6"))).toMap
    assert(out.keySet === Set(0L, 2L, 4L))
    assert(out(0L) === ((3L, 3L, 0L, 0L)))
    assert(out(2L) === ((3L, 3L, 1L, 333333L)))
    assert(out(4L) === ((2L, 1L, 1L, 1000000L))) // astral is one codepoint
  }

  test("cer caps at the leading `cap` CODEPOINTS (not code units)") {
    import spark.implicits._
    // 𝄞 repeated: 4 astral codepoints = 8 UTF-16 units; cap 3 keeps 3
    val g = "𝄞"
    val out = Wer.cer(Seq(
      0L -> (g * 4), 1L -> (g * 3)).toDF("doc_id", "text"), cap = 3).head()
    assert(out.getAs[Long]("c_len") === 3L && out.getAs[Long]("r_len") === 3L)
    assert(out.getAs[Long]("edits") === 0L) // both capped to 𝄞𝄞𝄞
  }

  test("cerSql mirror matches the Spark side row-for-row (unicode + cap + NULL)") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "kitten sat", 1L -> "sitting sat",
      2L -> "café 𝄞", 3L -> "cafe 𝄞!",
      4L -> "abcdefghij", 5L -> "abXdefghiZ",
      6L -> "cand with null ref", 7L -> null)
    val gotSpark = Wer.cer(docs.toDF("doc_id", "text"), cap = 8)
      .collect().map(r => r.getLong(0) ->
        (1 until 5).map(r.getLong)).toMap
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(Wer.cerSql(cap = 8,
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong)).toMap
    assert(gotSpark.keySet === Set(0L, 2L, 4L))
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
  }

  test("distinctN: hand-counted ratios; repetition drives the ratio down") {
    import spark.implicits._
    // corpus: 'a b a b' + 'a b': unigrams a×3 b×3 -> 2/6; bigrams
    // 'a b'×3, 'b a'×1 -> 2/4; trigrams 'a b a','b a b' -> 2/2
    val out = Wer.distinctN(
      Seq(0L -> "a b a b", 1L -> "a b").toDF("doc_id", "text"), maxN = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("distinct_grams"), r.getAs[Long]("total_grams"),
          r.getAs[Long]("distinct_ratio_e6"))).toMap
    assert(out(1) === ((2L, 6L, 333333L)))
    assert(out(2) === ((2L, 4L, 500000L)))
    assert(out(3) === ((2L, 2L, 1000000L)))
    // degenerate repetition: one token repeated -> ratio 1/N
    val rep = Wer.distinctN(Seq(0L -> "x x x x x x x x")
      .toDF("doc_id", "text"), maxN = 1).head()
    assert(rep.getAs[Long]("distinct_grams") === 1L)
    assert(rep.getAs[Long]("distinct_ratio_e6") === 125000L)
  }

  test("distinctNSql mirror matches the Spark side") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(0L -> "a b a b c", 1L -> "a b", 2L -> "the the the")
    val gotSpark = Wer.distinctN(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getInt(0) ->
        (1 until r.length).map(r.getLong)).toMap
    val values = docs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(Wer.distinctNSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toInt -> r.tail.map(_.get.toLong)).toMap
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
  }

  test("werCorpus: micro average (not the per-pair mean), exact totals") {
    import spark.implicits._
    val docs = Seq(
      0L -> "a x", 1L -> "a b",                              // 1 edit / 2
      2L -> "p q r s t u v w", 3L -> "p q r s t u v z",      // 1 edit / 8
      4L -> "unpaired", 5L -> null).toDF("doc_id", "text")
    val row = Wer.werCorpus(docs).head()
    assert(row.getAs[Long]("n_pairs") === 2L)
    assert(row.getAs[Long]("c_tokens") === 10L)
    assert(row.getAs[Long]("r_tokens") === 10L)
    assert(row.getAs[Long]("edits") === 2L)
    // micro 2/10 = 200000; the per-pair (macro) mean would be
    // (500000 + 125000) / 2 = 312500 — a different statistic
    assert(row.getAs[Long]("wer_e6") === 200000L)
  }

  test("werCorpusSql mirror matches the Spark side (cap + NULL side)") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "a x", 1L -> "a b",
      2L -> "p q r s t u v w", 3L -> "p q r s t u v z",
      4L -> "same here", 5L -> "same here",
      6L -> "cand with null ref", 7L -> null)
    val sp = Wer.werCorpus(docs.toDF("doc_id", "text"), cap = 6).head()
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val du = DuckBridgeTestUtil.duck(Wer.werCorpusSql(cap = 6,
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
    assert(du.map(_.get.toLong) ===
      (0 until 5).map(sp.getLong))
  }

  test("cerCorpus: micro codepoint rate; mirror matches (unicode + NULL)") {
    import spark.implicits._
    val docs = Seq(
      0L -> "ab", 1L -> "ax",                  // 1 edit / 2 cps
      2L -> "abcdefgh", 3L -> "abcdefgz",      // 1 edit / 8 cps
      4L -> "unpaired", 5L -> null)
    val row = Wer.cerCorpus(docs.toDF("doc_id", "text")).head()
    assert(row.getAs[Long]("n_pairs") === 2L)
    assert(row.getAs[Long]("r_cps") === 10L)
    assert(row.getAs[Long]("edits") === 2L)
    // micro 2/10 = 200000; macro would be (500000 + 125000)/2 = 312500
    assert(row.getAs[Long]("cer_e6") === 200000L)
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val du = DuckBridgeTestUtil.duck(Wer.cerCorpusSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))")).head
    assert(du.map(_.get.toLong) === (0 until 5).map(row.getLong))
  }
}
