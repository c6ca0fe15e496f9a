package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of fact-fact joins is the shuffle; both
  * sides written bucketed+sorted by the join key let Catalyst plan a
  * SortMergeJoin with NO Exchange on either side (and groupBy on the
  * bucket key skips its Exchange too). This is the "pre-partitioned
  * co-located join" strategy from the build brief; the BucketingSpec
  * asserts the Exchange-free plans.
  */
object Bucketing {

  /** Write df as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
