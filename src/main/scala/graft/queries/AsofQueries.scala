package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin
import QueryDsl._

/** As-of join in the correctness gate: for every click event, attach
  * the user's most recent error event at or before it. Oracle is
  * DuckDB's native ASOF LEFT JOIN.
  */
object AsofQueries {

  private val asofLatest: Q = (s, d) => {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ev_us"))
    // dedup right side to one row per (user, time) so ties are
    // deterministic in both engines
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("ev_us"))
      .agg(max_by(col("value"), col("event_id")).as("err_value"))
    AsofJoin.latestAsOf(clicks, errors, Seq("user_id"), "ev_us",
      payloadCols = Seq("err_value"), rightTimeAs = "err_us")
      .select(col("event_id"), col("user_id"), col("ev_us"),
        col("err_us"), col("err_value"))
  }

  private val asofLatestSql =
    s"""WITH l AS (SELECT event_id, user_id, $evUsSql AS ev_us FROM events
       |           WHERE event_type = 'click'),
       |r AS (SELECT user_id, $evUsSql AS err_us,
       |        max_by(value, event_id) AS err_value
       |      FROM events WHERE event_type = 'error' GROUP BY 1, 2)
       |SELECT l.event_id, l.user_id, l.ev_us, r.err_us, r.err_value
       |FROM l ASOF LEFT JOIN r
       |ON l.user_id = r.user_id AND r.err_us <= l.ev_us""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("asof_latest", asofLatest, Some(asofLatestSql))
  )
}
