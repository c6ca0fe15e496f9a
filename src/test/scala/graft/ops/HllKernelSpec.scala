package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllKernelSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import HllKernel.{M, MaxRank}

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("fixed-point log2 kernel brackets the true log over the full LC domain") {
    // exhaustive over every linear-counting input (V, m) the estimator
    // can see: digit-extraction truncates downward only, within a few ulps
    (1 to M).foreach { v =>
      val got = graft.util.FixedLog.log2fp(v.toLong, M.toLong).toDouble / (1 << 20)
      val want = math.log(v.toDouble / M) / math.log(2.0)
      assert(got <= want + 1e-12 && got >= want - 4.0 / (1 << 20),
        s"log2fp($v, $M) = $got vs $want")
    }
  }

  test("estimates land within the HLL error class of exact distincts (both regimes)") {
    import spark.implicits._
    // three groups straddling the linear-counting cutover (~2.5m = 2560)
    val df = Seq(
      ("small", 100), ("mid", 1000), ("big", 20000)
    ).flatMap { case (g, n) => (1 to n).map(i => (g, i.toLong * 7919 + g.hashCode)) }
      .toDF("grp", "k")
    val out = HllKernel.estimate(df, "grp", "k").collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val rse = 1.04 / math.sqrt(M.toDouble)
    Seq("small" -> 100L, "mid" -> 1000L, "big" -> 20000L).foreach { case (g, n) =>
      val (estE6, nExact) = out(g)
      assert(nExact === n, s"$g exact")
      val rel = math.abs(estE6 / 1e6 / n - 1.0)
      assert(rel < 3 * rse, s"$g est ${estE6 / 1e6} vs $n (rel $rel)")
    }
  }

  test("register merge across shards is BIT-identical to a single-pass rebuild") {
    val full = events.select(col("event_type").as("grp"), col("user_id").as("k"))
    def regMap(df: org.apache.spark.sql.DataFrame) =
      HllKernel.registers(df, "grp", "k").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val direct = regMap(full)
    // shard on a key-derived predicate, sketch each shard, merge by MAX
    val s1 = HllKernel.registers(full.filter(col("k") % 2 === 0), "grp", "k")
    val s2 = HllKernel.registers(full.filter(col("k") % 2 =!= 0), "grp", "k")
    val merged = s1.select(col("grp"), col("idx"), col("reg"))
      .union(s2.select(col("grp"), col("idx"), col("reg")))
      .groupBy("grp", "idx").agg(max("reg").as("reg"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(merged === direct)
  }

  test("exact distinct rides the register aggregation exactly") {
    val out = HllKernel.estimate(
      events.withColumnRenamed("event_type", "grp"), "grp", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === exact.map { case (g, n) => g -> n })
  }

  test("hour→day register rollup is BIT-identical to direct daily registers") {
    import org.apache.spark.sql.functions.expr
    val ev = graft.queries.QueryDsl.events(spark, "/root/testdata/sf0.001")
      .withColumn("hour_id", expr("ev_us div 3600000000"))
      .withColumn("day_id", expr("ev_us div 86400000000"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val rolled = toMap(HllKernel.registers(ev, "hour_id", "user_id")
      .groupBy(expr("grp div 24").as("day_id"), col("idx"))
      .agg(max(col("reg")).as("reg")))
    val direct = toMap(HllKernel.registers(ev, "day_id", "user_id")
      .select(col("grp"), col("idx"), col("reg")))
    assert(rolled === direct)
    // and the estimates off the rollup track the exact daily distincts
    val est = HllKernel.rollupEstimate(ev, "hour_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val exact = ev.groupBy(col("day_id"))
      .agg(countDistinct(col("user_id")).as("nd")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rse = 1.04 / math.sqrt(M.toDouble)
    exact.foreach { case (day, n) =>
      val rel = math.abs(est(day) / 1e6 / n - 1.0)
      assert(rel < 3 * rse, s"day $day est ${est(day) / 1e6} vs $n")
    }
  }

  test("raw-estimator constants stay inside their integer envelopes") {
    // the decimal(38,0)/HUGEINT numerator and the long-safe LC product
    assert(HllKernel.RawNumE6 < (BigInt(10).pow(38)), "numerator fits decimal(38,0)")
    val worstLc = M.toLong * HllKernel.Ln2E6 * (64L << 20) // |ql| ≤ 64·2^20
    assert(worstLc > 0 && worstLc < Long.MaxValue / 2, "LC product long-safe")
    assert(MaxRank === 55 && HllKernel.AlphaE6 === 720540L)
  }
}
