package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rolling-hash gram kernel must be a drop-in identity-preserving
  * replacement for the substring/concat_ws gram spellings the eval
  * trio shipped with in r13: same window boundaries (CODEPOINTS, not
  * UTF-16 code units — the reason RK-257 was rejected in PLANS_NOTES
  * r13.10), and hash-injective on real fixtures so clipped counts
  * can't drift. */
class GramHashesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  // astral-plane heavy: 𝄞 (U+1D11E) and 🜁 (U+1F701) are outside the
  // BMP (two UTF-16 code units each); ß/é exercise 2-byte UTF-8
  private val fixtures = Seq(
    "abcabc", "𝄞a𝄞b𝄞a", "🜁🜁x🜁", "aß é𝄞", "a", "𝄞", "", "  a  b",
    "the cat sat on the mat", "𝄞bc𝄞bc𝄞")

  /** Reference gram multiset by CODEPOINT windows (pure Scala). */
  private def refGrams(s: String, minN: Int, maxN: Int): Map[(Int, String), Int] = {
    val cps = s.codePoints().toArray
    (minN to maxN).flatMap { n =>
      (0 to cps.length - n).map(i =>
        n -> new String(cps, i, n))
    }.groupBy(g => (g._1, g._2)).map { case (k, v) => k -> v.size }
  }

  test("codepoint windows: gram multisets match the substring spelling on astral fixtures") {
    import spark.implicits._
    GramHashes.register(spark)
    val df = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = df.select(col("id"), explode(expr("cp_gram_hashes(s, 1, 3)")).as("e"))
      .select(col("id"), expr("CAST(e & 7 AS INT)").as("n"), col("e").as("g"))
      .groupBy("id", "n", "g").count()
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3))
      .toSeq.groupBy(_._1._1)
    fixtures.zipWithIndex.foreach { case (s, i) =>
      val ref = refGrams(s, 1, 3)
      val gotCounts = got.getOrElse(i.toLong, Seq.empty).map(_._2.toInt)
      // multiset of per-gram counts must agree exactly (injective on
      // the fixture -> same number of distinct grams, same counts)
      assert(gotCounts.sorted === ref.values.toSeq.sorted, s"fixture '$s'")
      // and per-order gram counts must agree (codepoint boundaries)
      (1 to 3).foreach { n =>
        val refN = ref.filter(_._1._1 == n).values.sum
        val gotN = got.getOrElse(i.toLong, Seq.empty)
          .filter(_._1._2 == n).map(_._2).sum
        assert(gotN.toInt === refN, s"fixture '$s' order $n")
      }
    }
  }

  test("UTF-16 code-unit windowing would disagree — the kernel must not (BMP-narrowing guard)") {
    // '𝄞a' has 2 codepoints but 3 UTF-16 code units: a code-unit
    // kernel emits 2 bigrams, the codepoint contract demands 1
    import spark.implicits._
    GramHashes.register(spark)
    val n2 = Seq((0L, "𝄞a")).toDF("id", "s")
      .select(explode(expr("cp_gram_hashes(s, 2, 2)")).as("e"))
      .count()
    assert(n2 === 1L)
  }

  test("word grams: multisets match the concat_ws spelling, empty tokens are real symbols") {
    import spark.implicits._
    GramHashes.register(spark)
    val texts = Seq("a b c a b", "the the the", "x", "", "a  b", "𝄞 a 𝄞")
    val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text").withColumn("ws", split(col("text"), " "))
    val got = df.select(col("id"), explode(expr("word_gram_hashes(ws, 1, 2)")).as("e"))
      .select(col("id"), expr("CAST(e & 7 AS INT)").as("n"), col("e").as("g"))
      .groupBy("id", "n", "g").count()
      .collect().groupBy(_.getLong(0))
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split(" ", -1).toSeq
      val ref = (1 to 2).flatMap { n =>
        (0 to ws.length - n).map(p => n -> ws.slice(p, p + n).mkString(" "))
      }.groupBy(identity).map { case (k, v) => k -> v.size }
      val gotCounts = got.getOrElse(i.toLong, Array.empty)
        .map(_.getLong(3).toInt).toSeq
      assert(gotCounts.sorted === ref.values.toSeq.sorted, s"text '$t'")
    }
  }

  test("packed order rides the low 3 bits; bounds are enforced") {
    import spark.implicits._
    GramHashes.register(spark)
    val ns = Seq((0L, "abcdefgh")).toDF("id", "s")
      .select(explode(expr("cp_gram_hashes(s, 1, 7)")).as("e"))
      .select(expr("CAST(e & 7 AS INT)").as("n"))
      .groupBy("n").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ns === (1 to 7).map(n => n -> (8L - n + 1)).toMap)
    intercept[Exception] {
      Seq((0L, "ab")).toDF("id", "s")
        .select(expr("cp_gram_hashes(s, 1, 8)")).collect()
    }
  }

  test("interpreted eval (no codegen) agrees with the one shared kernel") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val e = CodepointGramHashes(Literal(UTF8String.fromString("𝄞a𝄞"), StringType), 1, 2)
    val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() === 3 + 2) // 3 unigrams + 2 bigrams
    val ns = (0 until arr.numElements()).map(i => (arr.getLong(i) & 7).toInt)
    assert(ns.count(_ == 1) === 3 && ns.count(_ == 2) === 2)
    // identical windows hash identically: positions 0 and 2 are both 𝄞
    val unis = (0 until arr.numElements()).map(arr.getLong)
      .filter(v => (v & 7) == 1)
    assert(unis(0) === unis(2))
    assert(unis(0) !== unis(1))
  }
}
