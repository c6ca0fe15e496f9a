package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

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
