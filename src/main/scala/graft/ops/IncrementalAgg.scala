package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance — the materialized-view pattern
  * every 100 TB pipeline ends up needing: a per-key stats snapshot is
  * maintained by MERGING a new delta's partial aggregates into it,
  * never by re-scanning history. Works because the kept statistics are
  * all mergeable: count/sum add, min/max combine, and sum is carried
  * as DECIMAL(38,6) so the merge is associative (bit-exact regardless
  * of how many increments the total went through — also what lets a
  * full-recompute DuckDB oracle hash-match the incremental path).
  *
  * Scale shape: the merge is a key-partitioned full-outer join of two
  * pre-aggregated frames — shuffle volume is KEY cardinality, not
  * event volume; the delta-side partial agg is the only pass over new
  * data. avg is derived at read time (total/n), never stored.
  */
object IncrementalAgg {

  /** Per-user partial aggregates of an events slice. Sum stays decimal
    * (exact, mergeable); derive doubles only at presentation. */
  def partials(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(38, 6))).as("total_dec"),
        min(col("value")).as("mn"),
        max(col("value")).as("mx"))

  /** Merge a maintained snapshot with a new delta (both [[partials]]
    * shaped): full-outer on the key; counts/sums add, extremes
    * combine. least/greatest skip NULLs identically in Spark and
    * DuckDB, and a key absent from both sides cannot occur. */
  def merge(snapshot: DataFrame, delta: DataFrame): DataFrame = {
    val s = snapshot.select(col("user_id"), col("n").as("n_s"),
      col("total_dec").as("t_s"), col("mn").as("mn_s"), col("mx").as("mx_s"))
    val d = delta.select(col("user_id"), col("n").as("n_d"),
      col("total_dec").as("t_d"), col("mn").as("mn_d"), col("mx").as("mx_d"))
    s.join(d, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
        (coalesce(col("t_s"), lit(0).cast(DecimalType(38, 6))) +
          coalesce(col("t_d"), lit(0).cast(DecimalType(38, 6))))
          .cast(DecimalType(38, 6)).as("total_dec"),
        least(col("mn_s"), col("mn_d")).as("mn"),
        greatest(col("mx_s"), col("mx_d")).as("mx"))
  }

  /** Present a partials/merge frame: decimal total → double, avg
    * derived. */
  def present(stats: DataFrame): DataFrame =
    stats.select(col("user_id"), col("n"),
      col("total_dec").cast(DoubleType).as("total"),
      (col("total_dec").cast(DoubleType) / col("n").cast(DoubleType)).as("avg_value"),
      col("mn"), col("mx"))

  /** Gate: maintain the snapshot from the "historical" slice
    * (event_id % 5 < 3), merge the "new" delta (event_id % 5 >= 3),
    * and the result must equal a full recompute over everything —
    * which is exactly what the DuckDB oracle does. */
  def gateQuery(events: DataFrame): DataFrame = {
    val snapshot = partials(events.filter(col("event_id") % 5 < 3))
    val delta = partials(events.filter(col("event_id") % 5 >= 3))
    present(merge(snapshot, delta))
  }

  /** DuckDB oracle: the full recompute the incremental path must
    * reproduce bit-for-bit. */
  def gateSql: String =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_value,
      |  MIN(value) AS mn, MAX(value) AS mx
      |FROM events GROUP BY user_id""".stripMargin
}
