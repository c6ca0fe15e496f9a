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
}
