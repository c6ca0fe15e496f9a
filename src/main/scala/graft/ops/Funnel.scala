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

  /** Per-user stage timestamps for an N-stage ordered funnel over
    * `events` (columns user_id, event_type, ev_us). Only users who
    * reached stage 1 appear. Output: (user_id, t1..tN), -1 = not
    * reached. */
  def stages(events: DataFrame, stageTypes: Seq[String]): DataFrame = {
    require(stageTypes.nonEmpty)
    val k = stageTypes.size
    val spark = events.sparkSession
    import spark.implicits._
    val types = stageTypes.toArray
    val raw = events.select(col("user_id"), col("event_type"), col("ev_us"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ev_us"))
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        // Streaming cascade over contiguous per-user runs: the buffered
        // lookahead detects user boundaries without materializing a
        // user's events. State = the k stage timestamps only.
        val buf = rows.buffered
        new Iterator[(Long, Array[Long])] {
          private var out: (Long, Array[Long]) = _
          private var ready = false
          private def advance(): Unit = {
            while (!ready && buf.hasNext) {
              val user = buf.head._1
              val t = Array.fill(k)(-1L)
              var filled = 0
              while (buf.hasNext && buf.head._1 == user) {
                val (_, tpe, us) = buf.next()
                if (filled < k && tpe == types(filled) &&
                    (filled == 0 || us > t(filled - 1))) {
                  t(filled) = us; filled += 1
                }
              }
              if (t(0) >= 0) { out = (user, t); ready = true }
            }
          }
          override def hasNext: Boolean = { advance(); ready }
          override def next(): (Long, Array[Long]) = {
            advance()
            if (!ready) throw new NoSuchElementException("empty")
            ready = false
            out
          }
        }
      }
      .toDF("user_id", "ts")
    raw.select(col("user_id") +:
      (0 until k).map(i => col("ts")(i).as(s"t${i + 1}")): _*)
  }

  /** The 3-stage form (kept as the gate's shape). */
  def stages3(events: DataFrame, s1: String, s2: String,
      s3: String): DataFrame = stages(events, Seq(s1, s2, s3))

  /** Streaming funnel: per-user stage state advanced per micro-batch
    * (mapGroupsWithState, Update mode). Within a batch events sort by
    * event time (same discipline as LiveMerge — the buffer is bounded
    * by rate × trigger interval, not history); across batches the
    * cascade only ADVANCES (a stage timestamp never changes once set),
    * so the streaming result equals the batch cascade whenever arrival
    * respects event time at micro-batch granularity — the replay /
    * in-order-ingest case, asserted in FunnelSpec. State per user = the
    * k stage timestamps, O(stages) — the same invariant as the batch
    * kernel. Output rows carry `filled` so a consumer (or test) can
    * keep the most-advanced emission per user. */
  def stagesStream(events: DataFrame, stageTypes: Seq[String]): DataFrame = {
    val k = stageTypes.size
    val types = stageTypes.toArray
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"), col("event_type"), col("ev_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (user: Long, it: Iterator[(Long, String, Long)],
            gs: org.apache.spark.sql.streaming.GroupState[Array[Long]]) => {
          val t = gs.getOption.getOrElse(Array.fill(k)(-1L))
          var filled = t.indexWhere(_ < 0) match {
            case -1 => k
            case i => i
          }
          it.toArray.sortBy(_._3).foreach { case (_, tpe, us) =>
            if (filled < k && tpe == types(filled) &&
                (filled == 0 || us > t(filled - 1))) {
              t(filled) = us; filled += 1
            }
          }
          gs.update(t)
          (user, filled, t.toSeq)
        })
      .toDF("user_id", "filled", "ts")
      .select(col("user_id") +: col("filled") +:
        (0 until k).map(i => col("ts")(i).as(s"t${i + 1}")): _*)
  }

  /** DuckDB oracle: the self-join-per-stage form of the same cascade,
    * one chained CTE per stage. */
  def stagesSql(stageTypes: Seq[String], evUsSql: String): String = {
    val steps = stageTypes.zipWithIndex.drop(1).map { case (tpe, i) =>
      val n = i + 1
      s"""v$n AS (SELECT e.user_id, CAST(min(e.us) AS BIGINT) AS t$n
         |       FROM ev e JOIN v$i USING (user_id)
         |       WHERE e.event_type = '$tpe' AND e.us > v$i.t$i GROUP BY 1)"""
        .stripMargin
    }
    val joins = (2 to stageTypes.size)
      .map(n => s"LEFT JOIN v$n USING (user_id)").mkString(" ")
    val outs = (2 to stageTypes.size)
      .map(n => s"COALESCE(v$n.t$n, -1) AS t$n").mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id, event_type, $evUsSql AS us FROM events),
       |v1 AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t1
       |       FROM ev WHERE event_type = '${stageTypes.head}' GROUP BY 1)${
         if (steps.nonEmpty) ",\n" + steps.mkString(",\n") else ""}
       |SELECT v1.user_id, v1.t1${if (outs.nonEmpty) ", " + outs else ""}
       |FROM v1 $joins""".stripMargin
  }

  def stages3Sql(s1: String, s2: String, s3: String,
      evUsSql: String): String = stagesSql(Seq(s1, s2, s3), evUsSql)
}
