package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Specs for the inline round-8 gates (weighted median, KL novelty). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("weighted median: lower-median rule on a hand fixture") {
    import spark.implicits._
    // weights: 1.0×1, 2.0×2, 3.0×1 -> total 4, cum(2.0)=3, 2*3>=4
    // group B: single heavy value
    val li = Seq(
      ("A", 1.0, 1.0), ("A", 2.0, 2.0), ("A", 3.0, 1.0),
      ("B", 9.0, 5.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    // drive through the registered gate on a temp view? The gate reads
    // parquet; instead exercise the same algebra inline:
    val byValue = li.select(col("l_returnflag").as("g"),
        col("l_extendedprice").as("v"),
        floor(col("l_quantity")).cast("long").as("w"))
      .groupBy("g", "v").agg(sum("w").as("vw"))
    import org.apache.spark.sql.expressions.Window
    val cum = byValue.withColumn("cumw",
        sum(col("vw")).over(Window.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("vw")).over(Window.partitionBy(col("g"))))
    val got = cum.filter(col("cumw") * 2 >= col("total"))
      .groupBy("g").agg(min(col("v")).as("m")).orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("A", 2.0), ("B", 9.0)))
  }

  test("weighted median gate agrees with explode-by-weight brute force") {
    val li = graft.queries.QueryDsl.table(spark, "/root/testdata/sf0.001", "lineitem")
    val gate = graft.SparkEntry.queries("a_weighted_median")(spark, "/root/testdata/sf0.001")
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // reference: direct driver-side lower-weighted-median computation
    val rows = li.select(col("l_returnflag"), col("l_extendedprice"),
        floor(col("l_quantity")).cast("long").as("w")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val total = rs.map(_._3).sum
      var cum = 0L
      val m = sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
      (g, m)
    }.toSeq.sortBy(_._1)
    assert(gate === expected)
  }

  test("apportionment quotas sum EXACTLY to the budget with quota monotone in weight") {
    val got = graft.SparkEntry.queries("pipeline_apportion_budget")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5)))
    assert(got.map(_._3).sum === 100000L) // the Hamilton guarantee
    // monotone: more words never yields a smaller quota
    val byWords = got.sortBy(_._2)
    byWords.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 + 1, s"$a vs $b") // +1 remainder slack
    }
    // every quota within 1 of the exact proportional share
    val totW = got.map(_._2).sum
    got.foreach { case (lang, w, q) =>
      val exact = 100000.0 * w / totW
      assert(math.abs(q - exact) < 1.0, s"$lang quota $q vs exact $exact")
    }
  }

  test("KL novelty is nonnegative (log-sum bound) and discriminates") {
    val d = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("text_kl_divergence")(spark, d)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a.size === 500)
    // truncated-support KL is >= 0 by log-sum inequality; allow the
    // 6-dp per-term rounding slack
    assert(a.forall(_._2 >= -1e-3), a.filter(_._2 < -1e-3).take(3).toString)
    assert(a.exists(_._2 > 0.01)) // the signal discriminates
  }
}
