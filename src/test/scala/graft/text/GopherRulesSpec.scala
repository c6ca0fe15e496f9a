package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def auditRow(text: String) =
    GopherRules.audit(docs(text)).collect()(0)

  test("each rule fails on its own violation shape") {
    val base = ("the and " + Seq.fill(60)("word").mkString(" ")) // 62 words
    // rule 1: too short
    assert(!auditRow("the and of").getBoolean(6))   // ok_words
    // rule 2: mean word length out of range (1-char words)
    val short = ("the and " + Seq.fill(60)("a").mkString(" "))
    val r2 = GopherRules.audit(docs(short)).collect()(0)
    assert(!r2.getBoolean(7))                       // ok_len
    assert(r2.getBoolean(6))                        // words in range
    // rule 3: symbol ratio — inject > 10% '#' words
    val symb = ("the and " + Seq.fill(50)("word").mkString(" ") +
      " " + Seq.fill(10)("#").mkString(" "))
    assert(!auditRow(symb).getBoolean(8))           // ok_symbols
    // rule 4: alpha fraction — >20% numeric words
    val nums = ("the and " + Seq.fill(48)("word").mkString(" ") +
      " " + Seq.fill(14)("12345").mkString(" "))
    assert(!auditRow(nums).getBoolean(9))           // ok_alpha
    // rule 5: no stopwords
    val nostop = Seq.fill(62)("word").mkString(" ")
    assert(!auditRow(nostop).getBoolean(10))        // ok_stopwords
    // the clean base passes everything
    val ok = auditRow(base)
    assert((6 to 10).forall(ok.getBoolean) && ok.getBoolean(11)) // keep
  }

  test("metrics are exact on a hand case") {
    // "the and word word" -> 4 words, 14 alpha chars, mean 14/4=3.5? no:
    // text len 17, separators 3 -> (17-3)/4 = 3.5
    val r = auditRow("the and word word")
    assert(r.getLong(1) === 4L)
    assert(r.getDouble(2) === 3.5)
    assert(r.getLong(3) === 0L)   // symbols
    assert(r.getLong(4) === 4L)   // alpha words
    assert(r.getLong(5) === 2L)   // stopwords: the, and
  }

  test("corpus audit is total and keep implies every rule") {
    val out = GopherRules.audit(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val n = out.count()
    assert(n === 500)
    val bad = out.filter(col("keep") && !(col("ok_words") && col("ok_len") &&
      col("ok_symbols") && col("ok_alpha") && col("ok_stopwords"))).count()
    assert(bad === 0)
    // the rule set discriminates on this corpus (some kept, some not)
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < n, s"kept $kept of $n")
  }
}
