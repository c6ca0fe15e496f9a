package graft.text

import org.scalatest.funsuite.AnyFunSuite

class RougeLSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Reference LCS (full quadratic table) to pin the two-row kernel. */
  private def refLcs(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("lcsLen matches the full-table reference on random token lists") {
    val rnd = new scala.util.Random(14)
    val vocab = Array("a", "b", "c", "d", "e")
    for (trial <- 1 to 300) {
      val a = Array.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
      val b = Array.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
      assert(RougeL.lcsLen(a, b) === refLcs(a.toSeq, b.toSeq), s"trial $trial")
    }
    assert(RougeL.lcsLen(Array.empty, Array("a")) === 0)
    assert(RougeL.lcsLen(Array("a"), Array.empty) === 0)
  }

  test("identity: identical texts score exactly 1e6; hand case pins the algebra") {
    import spark.implicits._
    val t = "the cat sat on the mat"
    val same = RougeL.rougeL(Seq(0L -> t, 1L -> t).toDF("doc_id", "text"))
      .head()
    assert(same.getAs[Long]("rouge_l_f_e6") === 1000000L)
    assert(same.getAs[Long]("lcs") === 6L)
    // cand 'a b c d', ref 'a x c y d z': LCS = [a c d] = 3,
    // F1 = 2*3/(4+6) = 0.6 -> 600000
    val out = RougeL.rougeL(
      Seq(0L -> "a b c d", 1L -> "a x c y d z").toDF("doc_id", "text"))
      .head()
    assert(out.getAs[Long]("lcs") === 3L)
    assert(out.getAs[Long]("rouge_l_f_e6") === 600000L)
  }

  test("LCS is order-sensitive (not a bag overlap) and one-sided pairs drop") {
    import spark.implicits._
    // same bag of words, reversed order: LCS = 1 (any single token),
    // a bag metric would score 1e6
    val out = RougeL.rougeL(Seq(
      0L -> "a b c", 1L -> "c b a",
      2L -> "only candidate").toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L))
    assert(out(0L).getAs[Long]("lcs") === 1L)
    assert(out(0L).getAs[Long]("rouge_l_f_e6") === 2L * 1000000L / 6L)
  }

  test("gate cap truncates BOTH sides to the leading tokens; cap<=0 disables") {
    import spark.implicits._
    val docs = Seq(
      0L -> "a b c d e f g h", 1L -> "x y z a b c d e").toDF("doc_id", "text")
    val capped = RougeL.rougeL(docs, cap = 4).head()
    // leading 4 vs leading 4: 'a b c d' vs 'x y z a' -> LCS = 1
    assert(capped.getAs[Long]("c_len") === 4L)
    assert(capped.getAs[Long]("lcs") === 1L)
    val full = RougeL.rougeL(docs, cap = 0).head()
    assert(full.getAs[Long]("lcs") === 5L) // 'a b c d e'
  }

  test("rougeLSql mirror matches the Spark side row-for-row") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "a b c d", 1L -> "a x c y d z",
      2L -> "same text here", 3L -> "same text here",
      4L -> "p q r", 5L -> "x y z",
      6L -> "a b c d e f g h i j", 7L -> "j i h g f e d c b a",
      8L -> "one sided",
      10L -> "cand with null ref", 11L -> null) // NULL side = absent, both engines
    val gotSpark = RougeL.rougeL(docs.toDF("doc_id", "text"), cap = 6)
      .collect().map(r => r.getLong(0) ->
        (1 until 5).map(r.getLong)).toMap
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(RougeL.rougeLSql(cap = 6,
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong)).toMap
    assert(gotSpark.keySet === Set(0L, 2L, 4L, 6L))
    assert(gotDuck === gotSpark.map { case (k, v) => k -> v.toSeq })
    assert(gotSpark(2L)(3) === 1000000L) // identity through the mirror
    assert(gotSpark(4L)(3) === 0L)       // disjoint -> 0
  }

  test("rougeN: hand case pins ROUGE-1/2 P/R/F; 1-word sides NULL order 2") {
    import spark.implicits._
    val docs = Seq(
      0L -> "the cat sat on the mat", 1L -> "the cat on the mat",
      2L -> "one", 3L -> "one two",
      4L -> "same text here", 5L -> "same text here",
      6L -> "cand only").toDF("doc_id", "text")
    val got = RougeL.rougeN(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(0L, 2L, 4L))
    // pair 0 unigrams: cand {the:2, cat, sat, on, mat} (6 words), ref
    // {the:2, cat, on, mat} (5) -> clipped 2+1+1+1 = 5
    val p0 = got(0L)
    assert(p0.getAs[Long]("c_words") === 6L)
    assert(p0.getAs[Long]("r_words") === 5L)
    assert(p0.getAs[Long]("r1_clipped") === 5L)
    assert(p0.getAs[Long]("rouge1_p_e6") === 833333L) // 5/6
    assert(p0.getAs[Long]("rouge1_r_e6") === 1000000L)
    assert(p0.getAs[Long]("rouge1_f_e6") === 909090L) // 2*5/11
    // bigrams: cand 5 (the-cat cat-sat sat-on on-the the-mat), ref 4
    // (the-cat cat-on on-the the-mat) -> overlap the-cat/on-the/the-mat
    assert(p0.getAs[Long]("r2_clipped") === 3L)
    assert(p0.getAs[Long]("rouge2_p_e6") === 600000L)
    assert(p0.getAs[Long]("rouge2_r_e6") === 750000L)
    assert(p0.getAs[Long]("rouge2_f_e6") === 666666L) // 2*3/9
    // 1-word candidate: order 1 scores, order 2 columns are NULL
    val p2 = got(2L)
    assert(p2.getAs[Long]("r1_clipped") === 1L)
    assert(p2.getAs[Long]("rouge1_f_e6") === 666666L) // 2*1/3
    assert(p2.isNullAt(p2.fieldIndex("r2_clipped")))
    assert(p2.isNullAt(p2.fieldIndex("rouge2_f_e6")))
    // identity pair scores exactly 1e6 on both orders
    val p4 = got(4L)
    assert(p4.getAs[Long]("rouge1_f_e6") === 1000000L)
    assert(p4.getAs[Long]("rouge2_f_e6") === 1000000L)
  }

  test("rougeNSql mirror matches the Spark side row-for-row") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val docs = Seq(
      0L -> "the cat sat on the mat", 1L -> "the cat on the mat",
      2L -> "one", 3L -> "one two",
      4L -> "same text here", 5L -> "same text here",
      6L -> "x y z", 7L -> "p q",
      8L -> "one sided",
      10L -> "cand with null ref", 11L -> null)
    val gotSpark = RougeL.rougeN(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (1 until 11).map(i => Option(r.get(i)).map(_.toString.toLong))).toMap
    val values = docs.map { case (id, t) =>
      if (t == null) s"($id, NULL)" else s"($id, '$t')" }.mkString(", ")
    val gotDuck = DuckBridgeTestUtil.duck(RougeL.rougeNSql(
      from = s"(SELECT * FROM (VALUES $values) t(doc_id, text))"))
      .map(r => r(0).get.toLong -> r.tail.map(_.map(_.toLong)).toIndexedSeq)
      .toMap
    assert(gotSpark.keySet === Set(0L, 2L, 4L, 6L))
    assert(gotDuck === gotSpark)
    // disjoint pair: zero overlap, present (not dropped)
    assert(gotDuck(6L)(2) === Some(0L)) // r1_clipped
  }
}
