package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}
