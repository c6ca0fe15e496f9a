package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Planted corpus: target docs speak vocabulary A, half the raw pool
    * speaks A too, the other half speaks disjoint vocabulary Z. */
  private def corpus() = {
    val target = (1 to 40).map(i =>
      (i.toLong, s"alpha beta gamma delta tok$i", "tgt"))
    val rawLikeTarget = (101 to 140).map(i =>
      (i.toLong, s"alpha beta gamma delta raw$i", "raw"))
    val rawUnlike = (201 to 240).map(i =>
      (i.toLong, s"zork quux blarg frobnitz raw$i", "raw"))
    (target ++ rawLikeTarget ++ rawUnlike).toDF("doc_id", "text", "kind")
  }

  test("target-like raw docs outrank disjoint-vocabulary raw docs") {
    val out = Dsir.select(corpus(), col("kind") === "tgt",
      buckets = 64, k = 120)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val likeW = (101 to 140).map(i => out(i.toLong))
    val unlikeW = (201 to 240).map(i => out(i.toLong))
    assert(likeW.min > unlikeW.max,
      s"every target-like doc must outweigh every disjoint doc " +
        s"(min like ${likeW.min} vs max unlike ${unlikeW.max})")
  }

  test("top-k is deterministic and partitioning-invariant") {
    val df = corpus()
    val a = Dsir.select(df.repartition(1), col("kind") === "tgt",
      buckets = 64, k = 30).collect().map(_.toSeq)
    val b = Dsir.select(df.repartition(13), col("kind") === "tgt",
      buckets = 64, k = 30).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("gumbel sampler: deterministic, seed-sensitive, low-T recovers select") {
    val df = corpus()
    val s1 = Dsir.sample(df, col("kind") === "tgt", buckets = 64, k = 25,
      temperature = 1.0, seed = "a").collect().map(_.getLong(0)).toSeq
    val s2 = Dsir.sample(df.repartition(9), col("kind") === "tgt",
      buckets = 64, k = 25, temperature = 1.0, seed = "a")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "same seed → identical draw, any partitioning")
    val s3 = Dsir.sample(df, col("kind") === "tgt", buckets = 64, k = 25,
      temperature = 1.0, seed = "b").collect().map(_.getLong(0)).toSeq
    assert(s1 != s3, "different seed → different draw")
    // tiny temperature: weights dominate the bounded Gumbel noise, so
    // the sample converges to the deterministic top-k up to ties —
    // equal-weight docs at the boundary may swap (select breaks ties
    // by doc_id, the sampler by Gumbel), so compare the WEIGHT
    // multiset, which tie-swaps preserve
    val w = Dsir.weights(df, col("kind") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = Dsir.sample(df, col("kind") === "tgt", buckets = 64, k = 25,
      temperature = 1e-4, seed = "a").collect().map(_.getLong(0))
    val top = Dsir.select(df, col("kind") === "tgt", buckets = 64, k = 25)
      .collect().map(_.getLong(0))
    assert(cold.map(w).sorted.toSeq == top.map(w).sorted.toSeq)
  }

  test("fastHash twin: deterministic, k rows, same cold-temperature limit") {
    val df = corpus()
    val f1 = Dsir.sample(df, col("kind") === "tgt", buckets = 64, k = 25,
      temperature = 1.0, seed = "a", fastHash = true)
      .collect().map(_.getLong(0)).toSeq
    val f2 = Dsir.sample(df, col("kind") === "tgt", buckets = 64, k = 25,
      temperature = 1.0, seed = "a", fastHash = true)
      .collect().map(_.getLong(0)).toSeq
    assert(f1 == f2, "xxhash64 draw is deterministic")
    assert(f1.length == 25)
    // temperature → 0: the twin converges to ITS OWN weight top-k
    // (xxhash64 buckets differ from md5's, so compare within-variant)
    val wf = Dsir.weights(df, col("kind") === "tgt", buckets = 64,
      fastHash = true).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = Dsir.sample(df, col("kind") === "tgt", buckets = 64, k = 25,
      temperature = 1e-4, seed = "a", fastHash = true)
      .collect().map(_.getLong(0))
    val top = wf.toSeq.sortBy { case (id, w) => (-w, id) }.take(25).map(_._1)
    assert(cold.map(wf).sorted.toSeq == top.map(wf).sorted.toSeq)
  }

  test("an empty doc scores near-neutral and never beats target-like docs") {
    val df = corpus().union(Seq((999L, "", "raw")).toDF("doc_id", "text", "kind"))
    val out = Dsir.select(df, col("kind") === "tgt", buckets = 64, k = 10)
      .collect()
    assert(out.length == 10)
    assert(!out.map(_.getLong(0)).contains(999L))
  }
}
