package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the product-analytics query SQL is
  * famously bad at: for each user, the earliest time of stage 1, then
  * the earliest stage-2 event STRICTLY AFTER it, then the earliest
  * stage-3 event after that, and so on. A pure-SQL form needs one
  * self-join per stage; the typed per-user kernel does the whole
  * cascade in ONE shuffle on the user key and a linear scan of that
  * user's events (bounded by events-per-user, the same invariant the
  * stream-state operators rely on). Unreached stages emit the -1
  * sentinel (not NULL — keeps the gate's hash compare trivial).
  */
object Funnel {

  /** Per-user stage timestamps for a 3-stage funnel over `events`
    * (columns user_id, event_type, ev_us). Only users who reached
    * stage 1 appear. Output: (user_id, t1, t2, t3), -1 = not reached. */
  def stages3(events: DataFrame, s1: String, s2: String,
      s3: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("ev_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (user, it) =>
        val evs = it.toArray
        def minAfter(tpe: String, after: Long): Long = {
          var best = -1L
          var i = 0
          while (i < evs.length) {
            val (_, t, us) = evs(i)
            if (t == tpe && us > after && (best == -1L || us < best)) best = us
            i += 1
          }
          best
        }
        val t1 = minAfter(s1, Long.MinValue)
        val t2 = if (t1 >= 0) minAfter(s2, t1) else -1L
        val t3 = if (t2 >= 0) minAfter(s3, t2) else -1L
        (user, t1, t2, t3)
      }
      .filter(_._2 >= 0)
      .toDF("user_id", "t1", "t2", "t3")
  }

  /** DuckDB oracle: the self-join-per-stage form of the same cascade. */
  def stages3Sql(s1: String, s2: String, s3: String,
      evUsSql: String): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, $evUsSql AS us FROM events),
       |v1 AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t1
       |       FROM ev WHERE event_type = '$s1' GROUP BY 1),
       |v2 AS (SELECT e.user_id, CAST(min(e.us) AS BIGINT) AS t2
       |       FROM ev e JOIN v1 USING (user_id)
       |       WHERE e.event_type = '$s2' AND e.us > v1.t1 GROUP BY 1),
       |v3 AS (SELECT e.user_id, CAST(min(e.us) AS BIGINT) AS t3
       |       FROM ev e JOIN v2 USING (user_id)
       |       WHERE e.event_type = '$s3' AND e.us > v2.t2 GROUP BY 1)
       |SELECT v1.user_id, v1.t1,
       |       COALESCE(v2.t2, -1) AS t2, COALESCE(v3.t3, -1) AS t3
       |FROM v1 LEFT JOIN v2 USING (user_id) LEFT JOIN v3 USING (user_id)""".stripMargin
}
