package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the product-analytics query SQL is
  * famously bad at: for each user, the earliest time of stage 1, then
  * the earliest stage-2 event STRICTLY AFTER it, then the earliest
  * stage-3 event after that, and so on. A pure-SQL form needs one
  * self-join per stage; here the whole cascade is ONE shuffle on the
  * user key + a per-partition merge of the time-sorted stream.
  *
  * Skew safety (the 100 TB argument): the kernel holds O(stages) state
  * per user — three longs — never the user's event history. The
  * time-ordering the cascade needs comes from a secondary sort
  * (repartition on user, sortWithinPartitions on (user, ev_us)), which
  * runs in Spark's external sorter and SPILLS when a hot key (bot
  * account, instrumentation loop) exceeds task memory. A user with 10⁶
  * events costs disk, not an OOM — see FunnelSpec's hot-key soak.
  *
  * Determinism under timestamp ties: all stage transitions compare
  * strictly on `us`, so equal-timestamp events can never fill a stage
  * opened by one of them, whatever their relative sort order; the
  * result depends only on the (type, us) multiset.
  *
  * Unreached stages emit the -1 sentinel (not NULL — keeps the gate's
  * hash compare trivial).
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
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ev_us"))
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        // Streaming cascade over contiguous per-user runs: the buffered
        // lookahead detects user boundaries without materializing a
        // user's events. State = (t1, t2, t3) only.
        val buf = rows.buffered
        new Iterator[(Long, Long, Long, Long)] {
          private var out: (Long, Long, Long, Long) = _
          private var ready = false
          private def advance(): Unit = {
            while (!ready && buf.hasNext) {
              val user = buf.head._1
              var t1 = -1L; var t2 = -1L; var t3 = -1L
              while (buf.hasNext && buf.head._1 == user) {
                val (_, tpe, us) = buf.next()
                if (t1 < 0) { if (tpe == s1) t1 = us }
                else if (t2 < 0) { if (tpe == s2 && us > t1) t2 = us }
                else if (t3 < 0) { if (tpe == s3 && us > t2) t3 = us }
              }
              if (t1 >= 0) { out = (user, t1, t2, t3); ready = true }
            }
          }
          override def hasNext: Boolean = { advance(); ready }
          override def next(): (Long, Long, Long, Long) = {
            advance()
            if (!ready) throw new NoSuchElementException("empty")
            ready = false
            out
          }
        }
      }
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
