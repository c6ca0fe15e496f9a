package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-threshold sessionization: split each user's event stream into
  * sessions wherever the inter-event gap exceeds `gapUs`, then roll up
  * per-session stats. The batch twin of the streaming
  * `session_window` (StreamOps) — same semantics, derivable offline at
  * any scale for feature backfills and engagement analytics
  * (reference behavior: the live telemetry session cuts in
  * F1-25_Telemetry_DB_Record.py are the same gap rule applied by the
  * recorder's packet clock).
  *
  * Scale shape: the start-flag lag window and the running-sum
  * session-id window share ONE shuffle on user_id (same partitioning +
  * ordering → a single Exchange feeds both Window operators), and the
  * per-session rollup's partial aggregation folds each session to one
  * row before the second shuffle. Ordering ties break on the unique
  * event_id, so session boundaries are deterministic.
  */
object Sessionize {

  /** Per-session stats over `events`-shaped rows (user_id, ev_us,
    * event_id, event_type): session ordinal per user (1-based, in time
    * order), event count, span, and distinct event types. */
  def sessions(ev: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ev_us"), col("event_id"))
    ev.select(col("user_id"), col("ev_us"), col("event_id"),
        col("event_type"))
      .withColumn("is_start",
        when(col("ev_us") - lag(col("ev_us"), 1).over(byUser) <= gapUs,
          lit(0L)).otherwise(lit(1L)))
      .withColumn("session_id",
        sum(col("is_start")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ev_us")).as("start_us"),
        (max(col("ev_us")) - min(col("ev_us"))).as("duration_us"),
        countDistinct(col("event_type")).as("n_types"))
  }

  /** DuckDB oracle: identical two-window + rollup form. */
  def sessionsSql(gapUs: Long, evUsSql: String): String =
    s"""WITH ev AS (
       |  SELECT user_id, $evUsSql AS us, event_id, event_type FROM events),
       |flagged AS (
       |  SELECT user_id, us, event_id, event_type,
       |    CASE WHEN us - lag(us) OVER w <= $gapUs THEN 0 ELSE 1 END AS is_start
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sessions AS (
       |  SELECT user_id, us, event_type,
       |    sum(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  min(us) AS start_us,
       |  max(us) - min(us) AS duration_us,
       |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
       |FROM sessions GROUP BY 1, 2""".stripMargin
}
