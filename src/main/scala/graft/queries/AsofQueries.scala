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

  /** Point-in-time-correct feature assembly (the feature-store join):
    * for every click (the training spine) attach the user's latest
    * `view` value within a 1-hour staleness horizon and latest
    * `purchase` value within 24 hours — two chained as-of joins, each
    * one shuffle, with stale features NULLed instead of leaking
    * arbitrarily old state. This is the leakage-free label/feature
    * alignment every offline training set needs; resampling (the
    * reference's trick) is the special case where the spine is a grid. */
  private val hourUs = 3600000000L
  private val dayUs = 24 * hourUs

  private val jFeatureStore: Q = (s, d) => {
    val ev = events(s, d)
    val spine = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ev_us"))
    def feat(t: String, as: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id"), col("ev_us"))
      .agg(max_by(col("value"), col("event_id")).as(as))
    val withView = AsofJoin.latestAsOf(spine,
      feat("view", "view_val"), Seq("user_id"), "ev_us",
      payloadCols = Seq("view_val"), rightTimeAs = "view_us")
    val withBuy = AsofJoin.latestAsOf(withView,
      feat("purchase", "buy_val"), Seq("user_id"), "ev_us",
      payloadCols = Seq("buy_val"), rightTimeAs = "buy_us")
    withBuy.select(
      col("event_id"), col("user_id"), col("ev_us"),
      when(col("view_us") >= col("ev_us") - hourUs, col("view_us")).as("view_us"),
      when(col("view_us") >= col("ev_us") - hourUs, col("view_val")).as("view_val"),
      when(col("buy_us") >= col("ev_us") - dayUs, col("buy_us")).as("buy_us"),
      when(col("buy_us") >= col("ev_us") - dayUs, col("buy_val")).as("buy_val"))
  }

  private val jFeatureStoreSql =
    s"""WITH l AS (SELECT event_id, user_id, $evUsSql AS ev_us FROM events
       |           WHERE event_type = 'click'),
       |v AS (SELECT user_id, $evUsSql AS f_us,
       |        max_by(value, event_id) AS view_val
       |      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
       |b AS (SELECT user_id, $evUsSql AS f_us,
       |        max_by(value, event_id) AS buy_val
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |j1 AS (
       |  SELECT l.*, v.f_us AS view_us, v.view_val
       |  FROM l ASOF LEFT JOIN v
       |  ON l.user_id = v.user_id AND v.f_us <= l.ev_us),
       |j2 AS (
       |  SELECT j1.*, b.f_us AS buy_us, b.buy_val
       |  FROM j1 ASOF LEFT JOIN b
       |  ON j1.user_id = b.user_id AND b.f_us <= j1.ev_us)
       |SELECT event_id, user_id, ev_us,
       |  CASE WHEN view_us >= ev_us - $hourUs THEN view_us END AS view_us,
       |  CASE WHEN view_us >= ev_us - $hourUs THEN view_val END AS view_val,
       |  CASE WHEN buy_us >= ev_us - $dayUs THEN buy_us END AS buy_us,
       |  CASE WHEN buy_us >= ev_us - $dayUs THEN buy_val END AS buy_val
       |FROM j2""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("asof_latest", asofLatest, Some(asofLatestSql)),
    ("j_feature_store", jFeatureStore, Some(jFeatureStoreSql))
  )
}
