package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC snapshot maintenance — the stream twin of
  * [[graft.ops.Cdc.applyChangelog]]: per key, hold the latest change
  * and REMOVE the state on a delete (the tombstone path
  * [[LiveMerge]] never needs — its state only grows to driver
  * cardinality; a CDC feed's must also shrink, or a churn-heavy table
  * leaks state store forever).
  *
  * Semantics: last-write-wins by (ev_us, event_id); stale
  * out-of-order arrivals (older than the held state) are ignored, so
  * replaying batches in any order converges to the batch result. A
  * delete emits a tombstone row (`deleted = true`) so downstream
  * sinks can propagate the removal; a later re-insert resurrects the
  * key.
  *
  * Scale: state is one small row per LIVE key (removed keys cost
  * nothing), per-batch per-key buffering is bounded by the trigger
  * interval exactly as in LiveMerge's skew audit.
  */
object StreamCdc {

  case class Change(user_id: Long, ev_us: Long, event_id: Long,
      op: String, value: Double)
  case class KeyState(value: Double, updatedUs: Long, eventId: Long)
  case class SnapshotRow(user_id: Long, value: Double, updated_us: Long,
      deleted: Boolean)

  /** Pure per-key kernel shared by tests and the stream: fold one
    * batch's changes over the prior state; None = key absent. */
  def foldChanges(prior: Option[KeyState],
      changes: Seq[Change]): Option[KeyState] = {
    var cur = prior
    changes.sortBy(c => (c.ev_us, c.event_id)).foreach { c =>
      val newer = cur.forall(s =>
        c.ev_us > s.updatedUs ||
          (c.ev_us == s.updatedUs && c.event_id > s.eventId))
      if (newer) {
        cur =
          if (c.op == "D") None
          else Some(KeyState(c.value, c.ev_us, c.event_id))
      }
    }
    cur
  }

  /** Streaming snapshot: one SnapshotRow per key per batch that
    * touched it (Update-style); `deleted` rows mark removals. */
  def snapshot(changes: Dataset[Change]): Dataset[SnapshotRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, it: Iterator[Change], gs: GroupState[KeyState]) => {
          val batch = it.toArray.toSeq
          val next = foldChanges(gs.getOption, batch)
          next match {
            case Some(s) =>
              gs.update(s)
              Iterator.single(SnapshotRow(user, s.value, s.updatedUs,
                deleted = false))
            case None =>
              gs.remove() // tombstones are idempotent: removing an
              // absent key still emits, so sinks converge on replay
              val lastUs = batch.map(_.ev_us).max
              Iterator.single(SnapshotRow(user, 0.0, lastUs, deleted = true))
          }
        })
  }
}
