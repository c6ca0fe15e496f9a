package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Kernel behavior of the repetition filter and the PII scrubber on
  * crafted rows (the gate covers cross-engine exactness on the corpus;
  * this covers the semantics a user relies on). */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetition score: fully repeated text scores high, unique text zero") {
    val out = TextAnalysis.repetitionScore(docs(
      (1L, "a a a a a a"),          // one distinct word
      (2L, "w x y z q r"),          // all unique
      (3L, "ab")                    // single word: no 2/3-grams
    )).collect().map(r => r.getLong(0) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (w1, g2a, g3a) = out(1L)
    assert(math.abs(w1 - (1.0 - 1.0 / 6)) < 1e-12)
    assert(math.abs(g2a - (1.0 - 1.0 / 5)) < 1e-12) // "a a" ×5 distinct 1
    assert(math.abs(g3a - (1.0 - 1.0 / 4)) < 1e-12)
    assert(out(2L) === ((0.0, 0.0, 0.0)))
    assert(out(3L) === ((0.0, 0.0, 0.0))) // degenerate: defined as 0
  }

  test("pii scrub: emails and urls are counted and redacted, clean text untouched") {
    val out = TextAnalysis.piiScrub(docs(
      (1L, "reach me at jo.doe+x@mail-srv.example.org today"),
      (2L, "docs at https://a.example.com/x?q=1 and http://b.io/y"),
      (3L, "no pii here at all")
    )).collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) === ((1, 0, "reach me at <EMAIL> today")))
    assert(out(2L) === ((0, 2, "docs at <URL> and <URL>")))
    assert(out(3L) === ((0, 0, "no pii here at all")))
  }

  test("nfc normalization composes combining sequences and shortens codepoint count") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.nfcNormalize(docs(
      (1L, "plain ascii"))).collect().head
    val norm = out.getString(1)
    // tail " café Ångström" composes to " café Ångström"
    assert(norm === "plain ascii caf\u00e9 \u00c5ngstr\u00f6m")
    assert(out.getInt(2) === out.getInt(3) + 3) // 3 combining marks absorbed
    // idempotent: normalizing already-NFC text is identity
    graft.functions.NormalizeNfc.register(spark)
    val again = spark.sql(s"SELECT nfc_normalize('${norm.replace("'", "")}') AS t")
      .collect().head.getString(0)
    assert(again === norm.replace("'", ""))
  }

  test("dirty-corpus derivation plants pii deterministically by id") {
    val base = docs((7L, "t7"), (8L, "t8"), (77L, "t77"))
    val dirty = TextAnalysis.dirtyDocs(base).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dirty(7L) === "t7 contact user7@example.com")
    assert(dirty(8L) === "t8")
    assert(dirty(77L) === // 77 = 7·11: both appended, email first
      "t77 contact user77@example.com see https://docs.example.org/p/77")
    // scrubbing the dirty corpus recovers pii-free text
    val scrubbed = TextAnalysis.piiScrub(TextAnalysis.dirtyDocs(base))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(scrubbed(77L) === "t77 contact <EMAIL> see <URL>")
  }
}
