package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both axes): keep the rows no
  * other row dominates, where q dominates p iff q.x ≤ p.x ∧ q.y ≤ p.y
  * with at least one strict. The multi-objective "cheapest AND
  * smallest" query — the naive form is an O(n²) NOT EXISTS self-join.
  *
  * Distributed O(n log n) shape, no single-partition window: a point
  * survives iff (a) its y is strictly below the minimum y of every
  * point with strictly smaller x, and (b) its y equals the minimum y
  * among its own x. Both minima come from the DISTINCT-x table:
  *
  *  1. rows compact to (x, min y, …) per distinct x — one groupBy;
  *  2. distinct-x rows get IEEE-monotone range buckets on x (the
  *     [[GlobalRank]] bucketing trick) → per-bucket y-minima → prefix
  *     minima over the TINY bucket table, broadcast back;
  *  3. a window PARTITIONED BY BUCKET (never global) walks distinct-x
  *     rows for the within-bucket strict-prefix min;
  *  4. one keyed join back tags corpus rows with (m1, m2).
  *
  * All comparisons are on raw input values — no arithmetic — so the
  * result is exact and the DuckDB NOT EXISTS oracle hash-matches.
  */
object Skyline {

  /** Frontier rows of `df` minimizing (`xCol`, `yCol`); duplicates of
    * a surviving point all survive (neither strictly dominates). */
  def frontier(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    val x = col(xCol).cast("double")
    // distinct-x bounded; referenced by the stats pass AND the bucket
    // chain — pinned so the corpus groupBy runs once (scan census:
    // 5 → 2 source scans, the remaining two being this compaction and
    // the final tag-back join)
    val perX = df.groupBy(col(xCol)).agg(min(col(yCol)).as("_m2"))
      .localCheckpoint(true)
    val stats = perX.agg(min(x).as("_lo"), max(x).as("_hi"))
    val span = col("_hi") - col("_lo")
    val rawBucket = floor((x - col("_lo")) / span * lit(buckets.toDouble))
      .cast("int")
    val bucketed = perX.crossJoin(broadcast(stats)) // 1-row stats
      .withColumn("_bucket",
        when(span === 0.0, lit(0))
          .otherwise(least(greatest(rawBucket, lit(0)), lit(buckets - 1))))
      .drop("_lo", "_hi")
    // exclusive prefix min over the <=B-row bucket table
    val bucketPrefix = bucketed.groupBy(col("_bucket"))
      .agg(min(col("_m2")).as("_bmin"))
      .withColumn("_bprefix", min(col("_bmin")).over(
        // constant-valued (but non-foldable, so Catalyst keeps it)
        // partition key: identical single-partition execution on the
        // ≤B-row bucket table, without the global-window WARN
        Window.partitionBy(pmod(col("_bucket"), lit(1)))
          .orderBy(col("_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_bucket"), col("_bprefix"))
    val wInBucket = Window.partitionBy(col("_bucket")).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // least() skips nulls, so "no strictly-smaller x exists" (both
    // prefixes null) leaves _m1 null = +infinity.
    val tagged = bucketed
      .withColumn("_inprefix", min(col("_m2")).over(wInBucket))
      .join(broadcast(bucketPrefix), Seq("_bucket"))
      .withColumn("_m1", least(col("_inprefix"), col("_bprefix")))
      .select(col(xCol), col("_m2"), col("_m1"))
    df.join(tagged, Seq(xCol))
      .filter(col(yCol) === col("_m2") &&
        (col("_m1").isNull || col(yCol) < col("_m1")))
      .drop("_m2", "_m1")
  }

  /** DuckDB mirror: the quadratic NOT EXISTS definition (affordable
    * single-node at gate scale — exactly what the bucketed form
    * replaces at 100 TB). */
  def frontierSql(srcSql: String, xSql: String, ySql: String,
      outCols: String): String =
    s"""WITH src AS ($srcSql)
       |SELECT $outCols FROM src p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM src q
       |  WHERE q.$xSql <= p.$xSql AND q.$ySql <= p.$ySql
       |    AND (q.$xSql < p.$xSql OR q.$ySql < p.$ySql))""".stripMargin
}
