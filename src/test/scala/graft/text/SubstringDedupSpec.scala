package graft.text

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level dedup: hand-computed spans, canonical survival,
  * hashed ≡ exact, and clean-text reconstruction. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // k=10 throughout the hand tests so examples stay readable
  private val K = 10

  private def spans(df: DataFrame): Set[(Long, Long, Long)] =
    SubstringDedup.duplicatedSpans(df, K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("shared region flagged only in the later doc, maximal, end-inclusive") {
    // docs share chars 1..20 exactly; doc 1 is canonical for every gram
    val shared = "ABCDEFGHIJKLMNOPQRST" // 20 chars
    val d = docs(1L -> (shared + "-one-tail-xxxx"), 2L -> (shared + "=two=tail=yyyy"))
    // duplicated grams in doc 2: positions 1..11 (gram at 11 = chars 11..20),
    // one island -> span [1, 20]
    assert(spans(d) === Set((2L, 1L, 20L)))
  }

  test("within-doc repetition keeps the first occurrence") {
    val phrase = "0123456789" // exactly k chars
    val d = docs(5L -> (phrase + "ABCDEFGHIJ" + phrase + "KLMNOPQRST"))
    // the second copy of `phrase` starts at 21
    assert(spans(d) === Set((5L, 21L, 30L)))
  }

  test("span merge honours the gap-<=-k rule; adjacent copies fuse into one span") {
    // fillers are strictly non-repeating so they add no grams of their own
    val p = "0123456789"
    val far = docs(
      1L -> (p + "abcdefghijklmnopqrstuvwxy"),
      2L -> (p + "ABCDEFGHIJKLMNOPQRSTU" + p)) // flagged at 1 and 32: gap 31 > k
    assert(spans(far) === Set((2L, 1L, 10L), (2L, 32L, 41L)))
    val near = docs(
      1L -> (p + "abcdefghijklmnopqrstuvwxy"),
      2L -> (p + "ABCDEFGH" + p + "JKLMNOPQRSTUV")) // flagged at 1 and 19: gap 18 > k
    assert(spans(near) === Set((2L, 1L, 10L), (2L, 19L, 28L)))
    val touching = docs(
      1L -> (p + "abcdefghijklmnopqrstuvwxy"),
      2L -> (p + "ABCDE" + p + "JKLMNOPQRSTUV")) // flagged at 1 and 16: gap 15 > k
    assert(spans(touching) === Set((2L, 1L, 10L), (2L, 16L, 25L)))
    val adjacent = docs(
      1L -> (p + "abcdefghijklmnopqrstuvwxy"),
      2L -> (p + p)) // flagged at 1 and 11: gap 10 <= k -> ONE merged span
    assert(spans(adjacent) === Set((2L, 1L, 20L)))
  }

  test("no duplicates -> no spans; docs shorter than k ignored") {
    val d = docs(1L -> "abcdefghijklmnop", 2L -> "qrstuvwxyz012345", 3L -> "tiny")
    assert(spans(d).isEmpty)
  }

  test("hashed scale path is identical to the exact variant on a generated corpus") {
    val rnd = new scala.util.Random(42)
    def blob(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val boiler = blob(40)
    val rows = (1L to 60L).map { i =>
      val body = blob(30 + rnd.nextInt(120))
      // a third of the docs embed the boilerplate at a random offset
      val t = if (i % 3 == 0) {
        val cut = rnd.nextInt(body.length)
        body.substring(0, cut) + boiler + body.substring(cut)
      } else body
      (i, t)
    }
    val d = docs(rows: _*)
    val exact = SubstringDedup.duplicatedSpans(d, K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashed = SubstringDedup.duplicatedSpansHashed(d, K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    assert(hashed === exact)
  }

  test("dupStats zero-fills clean docs and uses integer-exact flag") {
    val shared = "ABCDEFGHIJKLMNOPQRST"
    val d = docs(
      1L -> (shared + blobPad), // canonical: 0 dup chars
      2L -> (shared + "=two=tail=yyyy"),
      3L -> "totally unrelated content here")
    val stats = SubstringDedup.dupStats(d, K).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(stats(1L) === ((0L, 0L, false)))
    assert(stats(3L) === ((0L, 0L, false)))
    val (n2, dup2, hi2) = stats(2L)
    assert(n2 === 1L && dup2 === 20L)
    // doc 2 length = 34, dup 20 -> 100 > 34 -> high_dup
    assert(hi2)
  }
  private val blobPad = "-one-tail-xxxx"

  test("removeSpans cuts exactly the spans and keeps the canonical copy") {
    val phrase = "0123456789"
    val d = docs(
      1L -> (phrase + "ABCDEFGHIJ"),
      2L -> ("uvwxyzUVWX" + phrase + "KLMNOPQRST"))
    val clean = SubstringDedup.removeSpans(d, K).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) === phrase + "ABCDEFGHIJ")        // canonical untouched
    assert(clean(2L) === "uvwxyzUVWX" + "KLMNOPQRST")  // middle span cut
  }

  test("word-gram spans report WORD coordinates and merge like the char variant") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ") // 10 shared words
    val d = docs(
      1L -> (shared + " alpha beta gamma delta"),
      2L -> ("pre1 pre2 " + shared + " omega1 omega2"))
    // k=4 word grams: doc 2's copy starts at word 3; flagged word
    // positions 3..9 (gram at 9 = words 9..12 of doc2 = tok7..tok10)
    val got = SubstringDedup.wordGramSpans(d, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((2L, 3L, 12L)))
  }

  test("incremental spans: history always wins canonicality, batch-only keeps first") {
    val p = "0123456789"
    val hist = docs(1L -> (p + "abcdefghijklmnopqrstuvwxy"))
    val batch = docs(
      10L -> (p + "ABCDEFGHIJKLMNOPQRSTU"),          // p known to history
      11L -> ("zyxwvutsrq" + "MNBVCXZLKJ"),          // batch-only gram, first copy
      12L -> ("zyxwvutsrq" + "QWERTYUIOP"))          // second copy -> flagged
    val got = SubstringDedup.incrementalSpans(batch,
        SubstringDedup.gramIndex(hist, K), expectedGrams = 10000L, k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 10 pos 1 flagged even though it is the batch's first copy of p
    // (history wins); doc 11 is the batch-canonical copy of zyxwvutsrq
    assert(got === Set((10L, 1L, 10L), (12L, 1L, 10L)))
  }

  test("incremental spans equal the full recompute restricted to batch docs") {
    val rnd = new scala.util.Random(13)
    def blob(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val boiler = blob(40)
    val all = (1L to 80L).map { i =>
      val body = blob(40 + rnd.nextInt(100))
      val t = if (i % 4 == 0) {
        val cut = rnd.nextInt(body.length)
        body.substring(0, cut) + boiler + body.substring(cut)
      } else body
      (i, t)
    }
    val d = docs(all: _*)
    val hist = d.where(org.apache.spark.sql.functions.col("doc_id") < 40)
    val batch = d.where(org.apache.spark.sql.functions.col("doc_id") >= 40)
    val full = SubstringDedup.duplicatedSpans(d, K).collect()
      .filter(_.getLong(0) >= 40)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = SubstringDedup.incrementalSpans(batch,
        SubstringDedup.gramIndex(hist, K), expectedGrams = 100000L, k = K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full.nonEmpty)
    assert(inc === full)
  }

  test("length invariant: clean length = n_chars - dup_chars for every doc") {
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = new String(Array.fill(n)(('a' + rnd.nextInt(26)).toChar))
    val boiler = blob(35)
    val d = docs((1L to 40L).map(i =>
      (i, if (i % 2 == 0) blob(50) + boiler + blob(20) else blob(80))): _*)
    val stats = SubstringDedup.dupStats(d, K).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(3))).toMap
    val clean = SubstringDedup.removeSpans(d, K).collect()
      .map(r => r.getLong(0) -> r.getString(1).length.toLong).toMap
    assert(clean === stats)
  }
}
