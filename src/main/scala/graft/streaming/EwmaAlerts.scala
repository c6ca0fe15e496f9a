package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key EWMA anomaly scoring — the live twin of the batch
  * `w_ewma` gate: every event is scored against the truncated (depth-8,
  * decay 0.75) exponential moving average of its key's recent values,
  * and flagged when it exceeds `alertFactor ×` that average. This is
  * the standing alert a telemetry/ingest pipeline keeps per user,
  * sensor, or source shard.
  *
  * State is the last `Depth−1` values per key — a fixed ~7-double
  * array, NOT history: memory is keys × depth regardless of stream
  * length or skew (the LiveMerge per-batch-bounded audit applies to
  * the batch buffer; the kept state is constant-size by construction).
  *
  * Determinism: events are folded in (ev_us, event_id) order within
  * each batch; in-order feeds reproduce the batch window formula
  * BIT-FOR-BIT (same weights, same left-fold addition order —
  * EwmaAlertsSpec proves streamed ≡ batch `w_ewma` on the real
  * corpus). Out-of-order arrivals score against the state as-of
  * arrival (the standard live-alerting tradeoff; replay in order to
  * re-score exactly).
  */
object EwmaAlerts {

  val Depth = 8
  val Decay = 0.75

  case class Event(user_id: Long, event_id: Long, ev_us: Long, value: Double)
  /** most-recent-first ring of the last Depth−1 values */
  case class Recent(values: List[Double])
  case class Scored(user_id: Long, event_id: Long, value: Double,
      ewma: Double, alert: Boolean)

  /** The SAME fold the batch window expression performs: left-fold
    * addition of w_i·x_i over present lags, i = 0 the current value. */
  def score(current: Double, recent: List[Double]): Double = {
    var num = 0.0; var den = 0.0
    var i = 0
    val xs = current :: recent
    var rest = xs
    while (i < Depth && rest.nonEmpty) {
      val w = math.pow(Decay, i)
      num += rest.head * w
      den += w
      rest = rest.tail
      i += 1
    }
    num / den
  }

  /** Pure per-key kernel: fold a batch of events (sorted by event
    * time) over the recent-values state, emitting one scored row per
    * event. Shared by the stream below and the spec's batch replay. */
  def foldBatch(prior: Recent, batch: Seq[Event], alertFactor: Double):
      (Recent, Seq[Scored]) = {
    var recent = prior.values
    val out = batch.sortBy(e => (e.ev_us, e.event_id)).map { e =>
      val ewma = score(e.value, recent)
      recent = (e.value :: recent).take(Depth - 1)
      Scored(e.user_id, e.event_id, e.value, ewma,
        alert = e.value > alertFactor * ewma)
    }
    (Recent(recent), out)
  }

  /** Streaming form: one Scored row per input event, append mode. */
  def scored(events: Dataset[Event], alertFactor: Double = 1.5):
      Dataset[Scored] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, it: Iterator[Event], gs: GroupState[Recent]) => {
          val (next, out) = foldBatch(
            gs.getOption.getOrElse(Recent(Nil)), it.toSeq, alertFactor)
          gs.update(next)
          out.iterator
        })
  }
}
