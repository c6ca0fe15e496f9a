package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected range-join rewrite: a bare `p BETWEEN lo AND hi` inner
  * join plans as a nested loop in a stock session, and as a binned
  * equi-join (same rows) once the rule is active with a bin width. */
class BinRangeJoinSpec extends AnyFunSuite {

  test("bare range join rewrites to a binned equi-join with identical rows") {
    val base = graft.SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config(BinRangeJoin.WidthConf, "32")
        .withExtensions(new graft.GraftExtensions().apply(_))
        .getOrCreate()
      import s.implicits._

      def pointsOf(ss: SparkSession) = {
        import ss.implicits._
        ss.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .select(col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("p"))
      }
      def intervalsOf(ss: SparkSession) =
        ss.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .filter(col("l_orderkey") % 31 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            datediff(col("l_shipdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("lo"))
          .withColumn("hi", col("lo") + 45)

      val q = pointsOf(s).join(intervalsOf(s),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      assert(!plan.contains("CartesianProduct"))

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(2), r.getInt(3))
      val got = q.select("o_orderkey", "p", "l_linenumber", "l_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(2)))
        .toSeq.sorted
      // reference: stock session, nested-loop plan, same logical query
      val refQ = pointsOf(base).join(intervalsOf(base),
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(refQ.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val ref = refQ.select("o_orderkey", "p", "l_linenumber", "l_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(2)))
        .toSeq.sorted
      assert(got.nonEmpty && got === ref)

      // joins that already carry an equi key are left alone (no bin
      // columns in the plan)
      val equi = pointsOf(s).join(
        intervalsOf(s).withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))

      // an inverted interval (lo > hi) must explode to an EMPTY bin
      // array under the rewrite (a bare Sequence would default its
      // step to -1 and materialize the full descending array), and a
      // sentinel-wide interval must fail clearly, not OOM
      val pts = Seq((1L, 50L)).toDF("pid", "p")
      val ivInv = Seq((10L, 9000000L, 0L), (11L, 0L, 100L))
        .toDF("iid", "lo", "hi")
      val inv = pts.join(ivInv, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!inv.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(inv.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 11L)))
      s.conf.set(BinRangeJoin.MaxBinsConf, "1000")
      val ivWide = Seq((10L, 0L, 10000000L)).toDF("iid", "lo", "hi")
      val ex = intercept[Exception] {
        pts.join(ivWide, col("p") >= col("lo") && col("p") <= col("hi"))
          .collect()
      }
      assert(ex.getMessage.contains("maxBins"), ex.getMessage)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
