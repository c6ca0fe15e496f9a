package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the lakehouse clustering move the
  * reference's per-(year, round) directory tree approximates for one
  * key pair, generalized to any two bounded integer dimensions: bit-
  * interleave the keys so rows close in BOTH dimensions land close in
  * ONE sort order, range-partition + sort by that z-value, and write.
  * Parquet row-group min/max stats over the z-ordered files then prune
  * selective filters on EITHER dimension — the standard OPTIMIZE
  * ZORDER BY layout, built from plain codegen'd bit arithmetic (no
  * UDF, no shuffle beyond the one range exchange the layout needs).
  *
  * At 100 TB this is a data-layout JOB, not a query: one range
  * repartition of the table by z, sortWithinPartitions, write. Every
  * file then covers a disjoint z-range (asserted in ZOrderSpec), which
  * is exactly what makes min/max pruning effective on both keys.
  */
object ZOrder {

  /** Morton code of two `bits`-bit non-negative ints: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Pure column
    * arithmetic — whole-stage codegen keeps it in the scan stage.
    * Requires 2·bits ≤ 62. */
  def morton(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** DuckDB spelling of [[morton]] over integer expressions. */
  def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x) >> $i) & 1) * ${1L << (2 * i)} + " +
        s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Reference JVM implementation (specs only). */
  private[ops] def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Lay `df` out in z-order of (xCol, yCol) (both already bounded to
    * `bits` bits): one range exchange on the z-value, files sorted
    * internally, z column dropped from the output. `partitions` sizes
    * the job (files ≈ partitions). */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
      partitions: Int, outDir: String): Unit =
    df.withColumn("_z", morton(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
}
