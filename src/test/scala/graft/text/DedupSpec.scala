package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("minhash signature is deterministic and order-independent") {
    val hashes = Seq("a b c", "d e f", "g h i").map(MinHashLsh.fnv1a64)
    val s1 = MinHashLsh.signature(hashes.iterator)
    val s2 = MinHashLsh.signature(hashes.reverse.iterator)
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === MinHashLsh.NumHashes)
    // a different set gives a different signature
    val s3 = MinHashLsh.signature(Seq("x y z").map(MinHashLsh.fnv1a64).iterator)
    assert(s1.toSeq !== s3.toSeq)
  }

  test("identical shingle sets share the full signature") {
    val h = Seq("a b c", "d e f").map(MinHashLsh.fnv1a64)
    assert(MinHashLsh.signature(h.iterator).toSeq ===
      MinHashLsh.signature(h.iterator).toSeq)
  }

  test("LSH near-dup pairs equal exact jaccard pairs on real corpus") {
    val exact = Shingles.exactJaccardPairs(docs, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashLsh.nearDuplicates(docs, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact)
  }

  test("simhash: identical docs → distance 0; near-dups detected within blocks") {
    val sig1 = SimHash.simhash(Iterator((0x123456789abcdefL, 1), (0x0fedcba987654321L, 2)))
    val sig2 = SimHash.simhash(Iterator((0x123456789abcdefL, 1), (0x0fedcba987654321L, 2)))
    assert(sig1 === sig2)
    // blocked pairs on real corpus must be a superset-verified set:
    // every returned pair truly has hamming <= 3
    val sigs = SimHash.signatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SimHash.nearPairs(SimHash.signatures(docs), 3).collect()
    pairs.foreach { r =>
      val d = java.lang.Long.bitCount(sigs(r.getLong(0)) ^ sigs(r.getLong(1)))
      assert(d === r.getInt(2).toLong || d === r.getLong(2))
      assert(d <= 3)
    }
    // completeness: brute-force all pairs <= 3 equals blocked result
    val ids = sigs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
    } yield (i, j)).toSet
    val blocked = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
  }

  test("exact dedup fingerprint: distinct texts → distinct hashes") {
    val n = docs.count()
    val fp = TextAnalysis.fingerprint(docs).select(countDistinct(col("fp"))).head.getLong(0)
    assert(fp === n) // corpus has no exact dups; hashing must not collide
  }

  test("containment catches doc-in-doc where jaccard misses") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"quoted$i word$i token$i").mkString(" ")
    val filler = (1 to 200).map(i => s"filler$i pad$i noise$i").mkString(" ")
    val planted = Seq(
      (1L, short),                 // the short doc
      (2L, s"$filler $short"),     // embeds doc 1 verbatim → containment ≈ 1
      (3L, (1 to 50).map(i => s"other$i stuff$i").mkString(" "))
    ).toDF("doc_id", "text")
    val cont = Shingles.exactContainmentPairs(planted, 0.9)
      .select("doc_a", "doc_b", "containment").collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(cont.head.getDouble(2) >= 0.9)
    // the same pair is invisible to Jaccard at any dedup-grade threshold:
    // |A∩B| / |A∪B| ≈ |A| / |B| ≈ 30/630
    val jac = Shingles.exactJaccardPairs(planted, 0.5).count()
    assert(jac === 0L)
  }

  test("containment: DF cap preserves high-containment pairs on real corpus") {
    // capped pair generation (the gated scale path) must still surface
    // every pair the uncapped exact measure finds at the gate threshold
    val uncapped = Shingles.exactContainmentPairs(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Shingles.exactContainmentPairs(docs, 0.9, 12L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped)
  }
}
