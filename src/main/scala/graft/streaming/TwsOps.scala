package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary-state streaming on Spark 4's `transformWithState` — the
  * successor API to `mapGroupsWithState` (typed per-key state handles,
  * RocksDB-backed, native TTL, timers, and initial-state seeding).
  * The engine keeps its older stateful ops on mapGroupsWithState for
  * breadth; THIS op is the forward path a long-lived 100 TB ingest
  * deploys on, because state lives off-heap in RocksDB (executor heap
  * no longer bounds keyspace) and per-state TTL replaces hand-rolled
  * eviction.
  *
  * Operator: per-user running event count + exact running value sum.
  * Values are integerized to micro-units BEFORE entering state
  * (floor(v·10⁶) — the engine's standard cross-engine-exact move), so
  * the running sum is a BIGINT — associative, restart-safe, and equal
  * to the batch aggregate regardless of micro-batch slicing. State per
  * key is two longs, O(keys) total, TTL-evictable.
  *
  * Gate form (`stream_running_stats`) is the batch equivalent of the
  * converged stream — same convention as `stream_latest_state` — and
  * TwsOpsSpec proves stream ≡ batch over a multi-batch MemoryStream
  * replay with every key's final emission matching the batch groupBy.
  */
object TwsOps {

  /** (n, running value sum in micro-units). */
  case class UserStat(n: Long, sumQ: Long)

  /** Per-key processor: fold incoming (user, vq) rows into the stored
    * (n, sumQ) and emit the updated running state once per batch. */
  class RunningUserStats
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var st: ValueState[UserStat] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserStat]("stat",
        Encoders.product[UserStat], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long)] = {
      var cur = if (st.exists()) st.get() else UserStat(0L, 0L)
      rows.foreach { case (_, vq) => cur = UserStat(cur.n + 1L, cur.sumQ + vq) }
      st.update(cur)
      Iterator.single((key, cur.n, cur.sumQ))
    }
  }

  /** Streaming form: `events` must carry (user_id: Long, vq: Long).
    * Emits (user_id, n, sum_q) running totals, one row per key per
    * micro-batch that touched it (Update mode). */
  def runningStats(events: Dataset[(Long, Long)]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningUserStats, TimeMode.None(),
        OutputMode.Update())
      .toDF("user_id", "n", "sum_q")
  }

  /** One closed session: (user_id, start/end in epoch millis, events). */
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n: Long)

  /** Open-session state: (start_ms, last_ms, n). */
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long)

  /** Timer-based gap sessionization — the transformWithState feature
    * the running-stats op doesn't exercise: EVENT-TIME TIMERS. A
    * session closes when the WATERMARK passes last_event + gap, not
    * when the next event for that user happens to arrive — so idle
    * users' sessions emit promptly and state is dropped the moment the
    * session can no longer grow (the watermark guarantees no
    * older-than-gap event is still in flight). mapGroupsWithState
    * forces hand-rolled timeout bookkeeping for this; here the runtime
    * owns the timer wheel, per key, off-heap.
    *
    * Within a micro-batch rows sort by event time (same bounded-buffer
    * discipline as LiveMerge: rate × trigger interval, not history);
    * a row landing inside the gap extends the open session, a row past
    * the gap closes it inline and opens the next. One event-time timer
    * per key is re-armed to last_ms + gap; on expiry the open session
    * emits and state clears — O(1) state and one timer per active key,
    * nothing retained for idle keys. */
  class GapSessions(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), Session] {
    @transient private var st: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[Session] = {
      val evs = rows.map(_._2.getTime).toArray.sorted
      var out = List.empty[Session]
      var cur = if (st.exists()) Some(st.get()) else None
      evs.foreach { t =>
        cur match {
          case Some(o) if t - o.last_ms <= gapMs =>
            // a late (within-watermark) event from an earlier batch may
            // predate the open session — extend BOTH boundaries so the
            // emitted session matches the event-time-ordered answer
            cur = Some(OpenSession(math.min(o.start_ms, t),
              math.max(o.last_ms, t), o.n + 1))
          case Some(o) =>
            out ::= Session(key, o.start_ms, o.last_ms, o.n)
            cur = Some(OpenSession(t, t, 1L))
          case None =>
            cur = Some(OpenSession(t, t, 1L))
        }
      }
      cur.foreach { o =>
        st.update(o)
        // re-arm: exactly one live timer per key (delete-then-register)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(o.last_ms + gapMs)
      }
      out.reverse.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      if (st.exists()) {
        val o = st.get()
        st.clear()
        Iterator.single(Session(key, o.start_ms, o.last_ms, o.n))
      } else Iterator.empty
    }
  }

  /** Streaming form: `events` must carry (user_id: Long, ev_ts:
    * Timestamp) with `withWatermark` already declared on ev_ts (the
    * event-time timers fire off that watermark). Emits one row per
    * CLOSED session (gap exceeded inline, or watermark passed the
    * session's horizon). */
  def gapSessions(events: DataFrame, gapMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ev_ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new GapSessions(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  /** Per-key bounded recent-N buffer on LIST STATE — the online
    * feature-store pattern ("last N events per user" served to a
    * model). ListState appends without deserializing the whole list
    * (RocksDB merge operand), and the buffer is re-trimmed to N on
    * every batch so state per key is O(N) forever — the unbounded-list
    * failure mode of hand-rolled mapGroupsWithState buffers can't
    * happen by construction. Emits each key's full buffer, newest
    * first, once per touching batch. */
  class RecentEvents(n: Int)
      extends StatefulProcessor[Long, (Long, Long, String), (Long, Seq[Long], Seq[String])] {
    @transient private var st: ListState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[(Long, String)]("recent",
        Encoders.product[(Long, String)], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, String)],
        tv: TimerValues): Iterator[(Long, Seq[Long], Seq[String])] = {
      rows.foreach { case (_, ms, tpe) => st.appendValue((ms, tpe)) }
      // newest-first by (ms, type); re-trim to the N cap
      val kept = st.get().toArray.sortBy { case (ms, tpe) => (-ms, tpe) }.take(n)
      st.put(kept)
      Iterator.single((key, kept.map(_._1).toSeq, kept.map(_._2).toSeq))
    }
  }

  /** Streaming recent-N: input (user_id, ev_ms, event_type). */
  def recentEvents(events: Dataset[(Long, Long, String)], n: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RecentEvents(n), TimeMode.None(),
        OutputMode.Update())
      .toDF("user_id", "recent_ms", "recent_types")
  }

  /** Per-key per-event-type counters on MAP STATE — point lookups and
    * single-entry updates instead of rewriting a whole map value each
    * batch (what a ValueState[Map] would do). State per key is
    * O(distinct types seen by that key). Emits the touched key's full
    * counter map per batch. */
  class TypeCounts
      extends StatefulProcessor[Long, (Long, String), (Long, Map[String, Long])] {
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        tv: TimerValues): Iterator[(Long, Map[String, Long])] = {
      rows.foreach { case (_, tpe) =>
        val cur = if (st.containsKey(tpe)) st.getValue(tpe) else 0L
        st.updateValue(tpe, cur + 1L)
      }
      val snap = st.iterator().map { case (k, v) => k -> v }.toMap
      Iterator.single((key, snap))
    }
  }

  /** Streaming per-type counters: input (user_id, event_type). */
  def typeCounts(events: Dataset[(Long, String)]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TypeCounts, TimeMode.None(),
        OutputMode.Update())
      .toDF("user_id", "counts")
  }

  /** Batch form of the converged stream — the gate query. */
  def runningStatsBatch(events: DataFrame): DataFrame =
    events
      .withColumn("vq", floor(col("value") * lit(1000000.0)).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("vq")).as("sum_q"))

  val runningStatsBatchSql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT)) AS BIGINT)
      |    AS sum_q
      |FROM events GROUP BY user_id""".stripMargin
}
