package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PmiNegSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("PMI: perfect co-occurrence scores ln(N/c); independence scores ~0") {
    // 100 docs: 'alpha beta' always together in half of them; 'gamma'
    // independent coin vs 'delta' coin (co-occur in 1/4)
    val d = (0 until 100).map { i =>
      val ab = if (i % 2 == 0) "alpha beta" else "zz"
      val g = if (i % 4 < 2) "gamma" else "yy"
      val dl = if (i % 2 == 0) "delta" else "xx" // delta rides the ab coin
      (i.toLong, s"$ab $g $dl")
    }.toDF("doc_id", "text")
    val pmi = Pmi.pairPmi(d, minPairCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // alpha+beta co-occur in all 50 docs containing either:
    // pmi = ln(100·50/(50·50)) = ln 2
    assert(math.abs(pmi(("alpha", "beta")) - math.log(2.0)) < 1e-6)
    // gamma vs delta: c(g)=50, c(d)=50, c(gd)=25 → ln(100·25/2500) = 0
    assert(math.abs(pmi(("delta", "gamma"))) < 1e-6)
  }

  test("PMI: DF cap drops stopword pairs before the join") {
    val d = (0 until 60).map(i => (i.toLong, s"the rare${i / 30}")).toDF("doc_id", "text")
    // 'the' appears in all 60 docs; cap at 40 keeps only rareX tokens,
    // whose pair never co-occurs → empty result
    val capped = Pmi.pairPmi(d, minPairCount = 1, maxTokenDF = 40)
    assert(capped.filter(col("tok_a") === "the" || col("tok_b") === "the").count() === 0L)
  }

  test("negative sampling: no self, no near-dup, deterministic, quota-filled") {
    val out = NegativeSampling.sample(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.nonEmpty)
    // no self-negatives
    assert(out.forall { case (a, _, n) => a != n })
    // no sampled negative is a near-dup of its anchor
    val pos = Shingles.exactJaccardPairs(docs, 0.5, 12L)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    assert(out.forall { case (a, _, n) => !pos.contains((a, n)) })
    // dense ranks 1..4 per anchor (corpus is big enough to fill quota)
    out.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to 4).toSeq, s"anchor $a")
    }
    // reproducible-uniform: a second run is identical
    val again = NegativeSampling.sample(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(t => (t._1, t._2)).toSeq === again.sortBy(t => (t._1, t._2)).toSeq)
  }
}
