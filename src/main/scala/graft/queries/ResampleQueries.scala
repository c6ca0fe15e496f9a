package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.GridResample
import QueryDsl._

/** The §2.6 custom operator in the correctness gate: per-user 1-hour
  * linear resample of the events value series, verified bit-exactly
  * against a DuckDB lead-join + lerp formulation.
  */
object ResampleQueries {

  private val stepUs = 3600L * 1000000L // 1 hour

  private val resampleLinear: Q = (s, d) => {
    import s.implicits._
    val samples = events(s, d)
      .select(col("user_id").as("key"), col("ev_us").as("x"),
        col("event_id").as("seq"), col("value").as("y"))
      .as[GridResample.Sample]
    GridResample.resample(samples, stepUs)
      .toDF("user_id", "grid_us", "value")
  }

  private val resampleLinearSql =
    s"""WITH s0 AS (
       |  SELECT user_id, $evUsSql AS ev_us, min_by(value, event_id) AS value
       |  FROM events GROUP BY 1, 2),
       |s AS (
       |  SELECT user_id, ev_us, value,
       |    lead(ev_us) OVER (PARTITION BY user_id ORDER BY ev_us) AS nxt_us,
       |    lead(value) OVER (PARTITION BY user_id ORDER BY ev_us) AS nxt_v
       |  FROM s0),
       |g AS (
       |  SELECT user_id, unnest(generate_series(min_us, max_us, ${stepUs}::BIGINT)) AS gx
       |  FROM (SELECT user_id, MIN(ev_us) AS min_us, MAX(ev_us) AS max_us
       |        FROM s0 GROUP BY 1) b)
       |SELECT g.user_id, g.gx AS grid_us,
       |  CASE WHEN s.nxt_us IS NULL THEN s.value
       |       ELSE s.value + (s.nxt_v - s.value) *
       |            (CAST(g.gx - s.ev_us AS DOUBLE) / CAST(s.nxt_us - s.ev_us AS DOUBLE))
       |  END AS value
       |FROM g JOIN s ON g.user_id = s.user_id
       |  AND s.ev_us <= g.gx AND (g.gx < s.nxt_us OR s.nxt_us IS NULL)""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("resample_linear", resampleLinear, Some(resampleLinearSql))
  )
}
