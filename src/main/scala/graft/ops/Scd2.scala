package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SCD2 (slowly-changing-dimension type 2) history builder: turn a
  * change stream into validity intervals — one row per run of equal
  * values per key, `valid_from` = the run's first change timestamp,
  * `valid_to` = the next run's start (-1 sentinel = current row).
  * The warehouse pattern behind every "what was this user's plan on
  * date X" question (answered with an as-of predicate
  * `valid_from <= X AND (X < valid_to OR valid_to = -1)`).
  *
  * Scale shape: two windows over ONE shuffle on the key (the second
  * window reuses the first's partitioning — no second Exchange), and
  * the run-collapse filter shrinks the frame before the lead. Ordering
  * ties break on the unique event_id, so intervals are deterministic.
  */
object Scd2 {

  /** Build history from `events`-shaped changes (user_id, event_type
    * as the tracked value, ev_us, event_id). */
  def history(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ev_us"), col("event_id"))
    changes.select(col("user_id"), col("event_type"), col("ev_us"),
        col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to",
        coalesce(lead(col("ev_us"), 1).over(w), lit(-1L)))
      .select(col("user_id"), col("event_type").as("value"),
        col("ev_us").as("valid_from"), col("valid_to"))
  }

  /** DuckDB oracle: identical two-window form. */
  def historySql(evUsSql: String): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, $evUsSql AS us, event_id FROM events),
       |m AS (
       |  SELECT user_id, event_type, us, event_id,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
       |  FROM ev),
       |runs AS (
       |  SELECT user_id, event_type, us, event_id FROM m
       |  WHERE prev IS NULL OR prev <> event_type)
       |SELECT user_id, event_type AS value, us AS valid_from,
       |  COALESCE(CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT), -1) AS valid_to
       |FROM runs""".stripMargin
}
