package graft.text

import org.scalatest.funsuite.AnyFunSuite

class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("identical texts share all fingerprints; disjoint texts share none") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog repeatedly", 8, 16)
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog repeatedly", 8, 16)
    assert(a === b && a.nonEmpty)
    val c = TextAnalysis.winnow("zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp", 8, 16)
    assert((a & c).isEmpty)
  }

  test("guarantee: a shared substring of length >= w+k-1 yields a shared fingerprint") {
    val shared = "columnar execution engines vectorize expression evaluation"
    val doc1 = "AAAA BBBB " + shared + " CCCC DDDD"
    val doc2 = "XXXX " + shared + " YYYY ZZZZ WWWW"
    val f1 = TextAnalysis.winnow(doc1, 8, 16)
    val f2 = TextAnalysis.winnow(doc2, 8, 16)
    assert((f1 & f2).nonEmpty) // shared span is 58 chars >= 16+8-1
  }

  test("short text below k produces no fingerprints; k..w+k-2 produces the global min") {
    assert(TextAnalysis.winnow("short", 8, 16).isEmpty)
    val tiny = TextAnalysis.winnow("just twenty chars!!", 8, 16)
    assert(tiny.size === 1)
  }

  test("md5Hash60 matches the DuckDB hex-prefix value and the md5-gram kernel honors edge cases") {
    // DuckDB: CAST('0x' || substr(md5('hello'),1,15) AS BIGINT)
    assert(MinHashLsh.md5Hash60("hello") === 419982666956583591L)
    assert(MinHashLsh.md5Hash60("") === MinHashLsh.md5Hash60(""))
    assert(TextAnalysis.md5GramHashes("short", 8).isEmpty)
    val hs = TextAnalysis.md5GramHashes("exactly eight!", 8)
    assert(hs.length === 7)
    assert(hs(0) === MinHashLsh.md5Hash60("exactly "))
    // selection is hash-agnostic: same set rules for both gram hashes
    assert(TextAnalysis.selectWindowMins(hs, 16) === Set(hs.min))
  }

  test("distributed fingerprints find the corpus near-dups via inverted-index join") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = TextAnalysis.winnowingFingerprints(docs).cache()
    val a = fp.select(col("doc_id").as("doc_a"), col("fingerprint"))
    val b = fp.select(col("doc_id").as("doc_b"), col("fingerprint"))
    val sharing = a.join(b, "fingerprint").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3) // short docs (~150 chars) yield ~20 prints total
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the known planted near-dups (jaccard >= 0.5) must all share many
    // winnowing fingerprints
    val exact = Shingles.exactJaccardPairs(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(sharing))
  }
}
