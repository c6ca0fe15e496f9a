package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataLayoutSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.01"

  /** Rows the parquet scan emitted (post row-group/page pruning,
    * pre FilterExec). */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect() // run to populate metrics
    def plan(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => plan(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(plan)
      }
    plan(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("sorted layout lets min/max stats prune row groups; unsorted scans everything") {
    // DATE, not the raw timestamp_ntz: Spark pushes ntz predicates to
    // the scan but the parquet reader can't evaluate row-group stats
    // for them (measured: zero groups skipped on perfectly banded
    // files) — date/long/int axes prune as expected
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_date"),
        col("l_quantity"))
    val total = li.count()
    val base = sys.props("java.io.tmpdir") +
      s"/graft-layout-${ProcessHandle.current().pid()}"
    DataLayout.writeSorted(li, s"$base/sorted", "ship_date")
    // same data, same row-group size, shuffled on an unrelated key
    li.repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(s"$base/unsorted")

    val filterExpr = "ship_date >= date'1996-03-01' AND " +
      "ship_date < date'1996-04-01'"
    val sorted = spark.read.parquet(s"$base/sorted").filter(filterExpr)
    val unsorted = spark.read.parquet(s"$base/unsorted").filter(filterExpr)
    // identical answers...
    val a = sorted.agg(count(lit(1)), sum("l_quantity")).collect()(0)
    val b = unsorted.agg(count(lit(1)), sum("l_quantity")).collect()(0)
    assert(a === b)
    assert(a.getLong(0) > 0)
    // ...but the sorted layout's scan emits a fraction of the rows
    val sortedRows = scanOutputRows(sorted)
    val unsortedRows = scanOutputRows(unsorted)
    assert(unsortedRows > (total * 3) / 4,
      s"unsorted layout should scan ~everything, got $unsortedRows/$total")
    assert(sortedRows < total / 4,
      s"sorted layout should prune most row groups, got $sortedRows/$total")
  }

  test("z-order layout prunes on BOTH axes; single-column sort prunes only its own") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
          .cast("long").as("ship_day"),
        col("l_quantity"))
    val total = li.count()
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    val base = sys.props("java.io.tmpdir") +
      s"/graft-zorder-${ProcessHandle.current().pid()}"
    // small row groups: z-pruning granularity is the row group — at
    // this toy row count 256 KB would mean ~10 groups total, hiding
    // the curve's locality (both layouts get the same setting)
    DataLayout.writeZOrdered(li, s"$base/z", "ship_day", "l_orderkey",
      files = 8, rowGroupBytes = 32 * 1024)
    DataLayout.writeSorted(li, s"$base/bydate", "ship_day",
      files = 8, rowGroupBytes = 32 * 1024)

    // ~1/12 of the date range; ~1/16 of the key range
    val dateFilter = "ship_day >= 1520 AND ship_day < 1550"
    val keyFilter = s"l_orderkey < ${maxKey / 16}"

    def rowsScanned(dir: String, filter: String): Long =
      scanOutputRows(spark.read.parquet(dir).filter(filter))
    // answers identical across layouts
    val zq = spark.read.parquet(s"$base/z").filter(dateFilter)
      .agg(count(lit(1)), sum("l_quantity")).collect()(0)
    val sq = spark.read.parquet(s"$base/bydate").filter(dateFilter)
      .agg(count(lit(1)), sum("l_quantity")).collect()(0)
    assert(zq === sq && zq.getLong(0) > 0)

    // the z-curve prunes meaningfully on BOTH axes...
    assert(rowsScanned(s"$base/z", dateFilter) < total / 2,
      "z-order should prune on the date axis")
    assert(rowsScanned(s"$base/z", keyFilter) < total / 2,
      "z-order should prune on the key axis")
    // ...while the single-column sort is blind on the other axis
    assert(rowsScanned(s"$base/bydate", keyFilter) > (total * 3) / 4,
      "date-sorted layout cannot prune a key filter")
    // and on its own axis the dedicated sort is (unsurprisingly) tighter
    assert(rowsScanned(s"$base/bydate", dateFilter) <
      rowsScanned(s"$base/z", dateFilter))
  }
}
