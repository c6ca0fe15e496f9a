package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (latest right row at or before each left row's time, per
  * key) via the union + last-non-null window idiom.
  *
  * The reference avoids as-of joins entirely by resampling onto a
  * shared grid (SURVEY §2.3 note); this operator covers the general
  * case when resampling is not wanted. No custom SparkPlan: tag both
  * sides, union, and take `last(payload, ignoreNulls)` over a
  * (key)-partitioned window ordered by (time, side) — right rows sort
  * before left rows at equal time, giving inclusive `<=` semantics.
  *
  * Scale: one shuffle on the key, one sort within partitions — the
  * same cost as a sort-merge join, with no range-explosion. Skewed
  * keys behave like any window partition (salt upstream if one key
  * dominates).
  */
object AsofJoin {

  /** @param left        probe side; all its columns are kept
    * @param right       build side: (keys ++ timeCol ++ payload) only
    * @param keys        equi-join keys
    * @param timeCol     ordering column name present on both sides
    * @param payloadCols right-side columns to attach (latest-as-of)
    * @param rightTimeAs output name for the matched right time (null
    *                    when no right row precedes the left row)
    */
  def latestAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String],
      rightTimeAs: String = "asof_time"): DataFrame = {
    // payload names that also exist on the left would otherwise emit
    // ambiguous duplicate columns — the right-side payload wins
    val leftCols = left.columns
      .filterNot(c => keys.contains(c) || c == timeCol || payloadCols.contains(c))
    // the matched right time keeps the right side's own time dtype
    // (timestamp stays timestamp; a long cast would corrupt it)
    val rtType = right.schema(timeCol).dataType
    val l2 = left.select(
      keys.map(col) ++ Seq(col(timeCol), lit(1).as("_side")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(rtType).as("_rt")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(timeCol), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(timeCol).cast(rtType).as("_rt")) ++
        payloadCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l2.unionByName(r2)
      .withColumn(rightTimeAs, last(col("_rt"), ignoreNulls = true).over(w))
    val withPayload = payloadCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    withPayload
      .filter(col("_side") === 1)
      .drop("_side", "_rt")
  }
}
