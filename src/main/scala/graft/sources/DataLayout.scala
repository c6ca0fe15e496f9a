package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scan-pruning data layout: range-partition + sort the data by the
  * dominant filter column before writing, so every parquet row group
  * covers a narrow min/max band of that column and a selective filter
  * prunes row groups (and pages) at the READER, not in a post-scan
  * FilterExec. At 100 TB this is the difference between a point query
  * scanning one file's worth of row groups and scanning the fleet:
  * pushdown only helps when the layout gives the statistics something
  * to cut. Small `rowGroupBytes` sharpens the bands (more, narrower
  * groups) at a small metadata cost — tune to the filter selectivity
  * you serve.
  */
object DataLayout {

  /** Write `df` clustered by `sortCol`: range-partitioned across
    * files, sorted within each, with `rowGroupBytes`-sized row
    * groups. */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
      files: Int = 8, rowGroupBytes: Long = 256 * 1024): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)

  /** Morton (Z-order) interleave of two 16-bit bucket columns — bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Pure column
    * expressions (an OR-fold of shifts), so it codegens. */
  def zInterleave16(a: Column, b: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Min/max scale a long axis onto 0..65535 buckets (the z-order
    * input domain). Degenerate axes (min == max) land in bucket 0.
    * Both the span and the offset subtraction run in DOUBLE: long
    * arithmetic would wrap for extreme ranges (e.g. sentinel
    * Long.MinValue/MaxValue values) and silently degrade the curve
    * into garbage buckets; the double forms are overflow-free and
    * bucketing only needs 16 bits of precision anyway. */
  private def bucket16(c: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - lit(lo.toDouble)) /
        lit(hi.toDouble - lo.toDouble + 1.0) * 65536.0).cast("long"))

  /** Write `df` clustered on TWO long axes at once via a Z-order
    * (Morton) curve: each axis min/max-scales to 16-bit buckets, the
    * buckets bit-interleave into one z-value, and the data is
    * range-partitioned + sorted by it. A single-column sort gives
    * row-group pruning on that column and nothing else; the z-curve
    * keeps row groups tight on BOTH axes (a selective filter on either
    * one prunes ~√selectivity of the curve instead of scanning 100%) —
    * the standard lakehouse layout for two competing filter columns
    * when you can't afford two copies of 100 TB. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int = 8, rowGroupBytes: Long = 256 * 1024): Unit = {
    // two scalars per axis; one tiny aggregation job, then literals in
    // the layout expression (no join, no broadcast in the write plan)
    val b = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    // empty (or all-null-axis) input: nothing to cluster — write as-is
    if (b.isNullAt(0) || b.isNullAt(2)) {
      df.write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", rowGroupBytes.toString)
        .parquet(path)
      return
    }
    val z = zInterleave16(
      bucket16(col(colA).cast("long"), b.getLong(0), b.getLong(1)),
      bucket16(col(colB).cast("long"), b.getLong(2), b.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
  }
}
