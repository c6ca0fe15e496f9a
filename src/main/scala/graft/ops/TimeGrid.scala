package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-grid resample with forward-fill: project each key's irregular
  * event stream onto an ABSOLUTE epoch-aligned grid (t = k·step) and
  * carry the latest value at or before each grid point — the
  * time-axis sibling of the distance-grid resample
  * ([[GridResample]], reference P2 notebook) and the standard
  * regularization step before windowed feature extraction (aligned
  * grids join across keys by construction; per-key-anchored grids do
  * not).
  *
  * Scale shape: the spine is generated from a per-key (min, max)
  * aggregate (one partial-agg shuffle, then a narrow explode — spine
  * rows ≈ span/step per key, never corpus²); the fill is
  * [[AsofJoin.latestAsOf]]'s union + last-non-null window — one
  * shuffle on the key, sort-merge cost, no range explosion. Events
  * sharing a timestamp are pre-collapsed to the max-event_id row so
  * the as-of value is deterministic.
  *
  * The grid starts at the first multiple of `stepUs` ≥ the key's
  * first event, so every grid point has a predecessor — the output
  * has no null fills by construction. Timestamps must be ≥ 0 (epoch
  * micros are): Spark's `div` truncates toward zero while the
  * oracle's `//` floors, and the two only agree on non-negative
  * operands. */
object TimeGrid {

  /** @return (user_id, t_us, asof_us, value) — one row per grid point
    *         per user, value forward-filled. */
  def resampleFfill(ev: DataFrame, stepUs: Long): DataFrame = {
    require(stepUs > 0)
    val dedup = ev.groupBy(col("user_id"), col("ev_us").as("t_us"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val grid = dedup.groupBy(col("user_id"))
      .agg(min(col("t_us")).as("lo"), max(col("t_us")).as("hi"))
      .withColumn("k0", expr(s"(lo + ${stepUs - 1}L) div ${stepUs}L"))
      .withColumn("k1", expr(s"hi div ${stepUs}L"))
      // a span holding no grid multiple has k0 > k1: DuckDB's
      // generate_series is empty there, but Spark's sequence would
      // count DOWN and fabricate grid points — guard explicitly
      .where(col("k0") <= col("k1"))
      .select(col("user_id"),
        explode(sequence(col("k0"), col("k1"))).as("k"))
      .select(col("user_id"), (col("k") * stepUs).as("t_us"))
    AsofJoin.latestAsOf(grid, dedup, Seq("user_id"), "t_us",
      payloadCols = Seq("value"), rightTimeAs = "asof_us")
      .select(col("user_id"), col("t_us"), col("asof_us"), col("value"))
  }

  /** DuckDB oracle: identical grid arithmetic + ASOF join. */
  def resampleFfillSql(stepUs: Long, evUsSql: String): String =
    s"""WITH ev0 AS (
       |  SELECT user_id, $evUsSql AS us, event_id, value FROM events),
       |ded AS (
       |  SELECT user_id, us, arg_max(value, event_id) AS value
       |  FROM ev0 GROUP BY 1, 2),
       |spans AS (
       |  SELECT user_id, min(us) AS lo, max(us) AS hi FROM ded GROUP BY 1),
       |grid AS (
       |  SELECT user_id, CAST(k * $stepUs AS BIGINT) AS t_us
       |  FROM spans,
       |    unnest(generate_series((lo + ${stepUs - 1}) // $stepUs,
       |      hi // $stepUs)) g(k))
       |SELECT g.user_id, g.t_us, e.us AS asof_us, e.value
       |FROM grid g ASOF JOIN ded e
       |  ON g.user_id = e.user_id AND g.t_us >= e.us""".stripMargin
}
