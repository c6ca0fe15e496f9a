package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private def li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("hash sample: deterministic, repartition-invariant, ~pct sized") {
    val keys = Seq("l_orderkey", "l_linenumber")
    val a = Sampling.hashSample(li, 20.0, keys)
      .select("l_orderkey", "l_linenumber").collect().toSet
    val b = Sampling.hashSample(li.repartition(13), 20.0, keys)
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(a === b)
    val frac = a.size.toDouble / li.count()
    assert(frac > 0.14 && frac < 0.26, s"got $frac")
    // monotone: 10% sample ⊂ 20% sample (bucket threshold semantics)
    val c = Sampling.hashSample(li, 10.0, keys)
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(c.subsetOf(a))
  }

  test("stride keeps every Nth row per group") {
    val s = Sampling.stride(li, 5, Seq("l_orderkey"),
      Seq("l_linenumber", "l_partkey"))
    val total = li.count()
    assert(math.abs(s.count() - total / 5.0) < total * 0.2)
  }

  test("group cap bounds rows per group deterministically") {
    val capped = Sampling.groupCap(li, 2, Seq("l_orderkey"),
      Seq(col("l_linenumber"), col("l_partkey")))
    val maxPerGroup = capped.groupBy("l_orderkey").count()
      .agg(max("count")).head.getLong(0)
    assert(maxPerGroup <= 2L)
  }

  test("weighted sample: weight-proportional, deterministic, distributed top-k plan") {
    import spark.implicits._
    // 1000 light rows (w=1) + 20 heavy rows (w=1000): the heavy block
    // should dominate a k=50 draw by E-S theory; with the fixed
    // md5-derived uniforms the outcome is exactly reproducible
    val rows = ((1L to 1000L).map(i => (i, 1.0)) ++
      (2001L to 2020L).map(i => (i, 1000.0))).toDF("doc_id", "wt")
    val sample = Sampling.weightedSample(rows, k = 50, idCol = "doc_id",
      weight = col("wt"))
    val picked = sample.collect().map(_.getLong(0)).toSet
    assert(picked.size === 50)
    val heavyPicked = picked.count(_ >= 2001L)
    assert(heavyPicked >= 18, s"only $heavyPicked/20 heavy rows drawn")
    // determinism: second run identical
    val again = Sampling.weightedSample(rows, k = 50, idCol = "doc_id",
      weight = col("wt")).collect().map(_.getLong(0)).toSet
    assert(again === picked)
    // scale shape: global top-k must plan TakeOrderedAndProject, not a
    // single-partition window
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
