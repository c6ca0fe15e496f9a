package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("blocked pairs carry exact edit distances and catch the corpus near-dups") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = FuzzyDedup.levenshteinPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.nonEmpty)
    // every reported distance is the true levenshtein of the pair
    val texts = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.foreach { case ((a, b), d) =>
      assert(d === levenshteinRef(texts(a), texts(b)), s"pair ($a,$b)")
      assert(d <= 30)
    }
    // the jaccard near-dup pairs at this SF are also edit-close: the
    // fuzzy operator must find pairs overlapping the minhash set
    val jacc = MinHashLsh.nearDuplicates(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacc.intersect(pairs.keySet).nonEmpty)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val tmp = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = tmp
      }
    }
    dp(a.length)
  }

  test("train/test split is deterministic, complete, and roughly 90/10") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val split = CorpusPipeline.trainTestSplit(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size === docs.count())
    val nTest = split.values.count(_ == "test")
    assert(nTest > 0 && nTest < split.size / 5) // ~10% of 50 docs
    // stable under repartitioning (hash-based, not positional)
    val again = CorpusPipeline.trainTestSplit(docs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === split)
  }

  test("domain mix rebalances languages deterministically, never upsamples") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = CorpusPipeline.domainMix(docs, targetPerLang = 60L)
    val after = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet)
    after.foreach { case (lang, n) =>
      assert(n <= before(lang), s"$lang upsampled")
      // binomial noise around the target for downsampled langs;
      // small langs (< target) keep everything
      if (before(lang) <= 60) assert(n === before(lang))
      else assert(math.abs(n - 60) < 30, s"$lang kept $n, target 60")
    }
    // hash acceptance → stable under repartitioning
    val again = CorpusPipeline.domainMix(docs.repartition(13), 60L)
      .collect().map(_.getLong(0)).toSet
    assert(again === mixed.collect().map(_.getLong(0)).toSet)
  }

  test("contamination flags test docs whose near-dup partner landed in train") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val split = CorpusPipeline.trainTestSplit(docs)
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // find a near-dup pair straddling the split (exists at sf0.01)
    val straddling = MinHashLsh.nearDuplicates(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => byDoc(a) != byDoc(b) }
    val contaminated = CorpusPipeline.contamination(docs)
      .filter(col("n_contaminated") > 0)
      .collect().map(_.getLong(0)).toSet
    straddling.foreach { case (a, b) =>
      val testDoc = if (byDoc(a) == "test") a else b
      assert(contaminated.contains(testDoc),
        s"near-dup test doc $testDoc with train partner must be flagged")
    }
    assert(straddling.nonEmpty && contaminated.nonEmpty)
  }
}
