package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming building blocks beyond the latest-merge: watermarked
  * tumbling windows (the natural extension the reference lacks —
  * SURVEY §2.8 "Windows: none") and the S10 throttled sink.
  */
object StreamOps {

  /** Tumbling-window aggregation with a watermark: counts + value sums
    * per (window, event_type). The watermark bounds state: at 100 TB/day
    * rates, state is windows×types, and late rows beyond `lateness` are
    * dropped deterministically instead of growing state forever. */
  def windowedCounts(events: DataFrame, tsCol: String = "ev_ts",
      window_ : String = "1 hour", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Session-window aggregation (gap-based): events closer than `gap`
    * merge into one session per key; a session closes when no event
    * arrives within the gap. Runs identically in batch and streaming
    * (state-store-backed merging sessions with the watermark bounding
    * state). Windows are emitted as epoch-micros longs so the batch
    * form is engine-comparable. */
  def sessionCounts(events: DataFrame, tsCol: String = "ev_ts",
      gap: String = "30 minutes", lateness: String = "10 minutes",
      watermarked: Boolean = true): DataFrame = {
    val in = if (watermarked) events.withWatermark(tsCol, lateness) else events
    in
      .groupBy(session_window(col(tsCol), gap).as("sw"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("total_value"))
      .select(expr("unix_micros(sw.start)").as("session_start_us"),
        expr("unix_micros(sw.end)").as("session_end_us"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Stream-stream interval (attribution) join: each view matched to
    * the purchases of the same user within `maxLag` after it — the
    * canonical Structured Streaming two-stream join, with watermarks on
    * BOTH sides so the state store can expire unmatched rows (state is
    * bounded by lateness + maxLag, not stream length). Contract:
    * views(user_id, view_id, view_ts), purchases(user_id, purchase_id,
    * purchase_ts, purchase_value). Batch form (watermarked = false) is
    * the same plan — an equi-join on user_id with a range predicate,
    * which Spark executes as a key-partitioned join with the range as
    * a post-filter: one shuffle on the key at any scale. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      maxLag: String = "2 hours", lateness: String = "10 minutes",
      watermarked: Boolean = true, joinType: String = "inner"): DataFrame = {
    val v = if (watermarked) views.withWatermark("view_ts", lateness) else views
    val p0 = purchases.withColumnRenamed("user_id", "p_user")
    val p = if (watermarked) p0.withWatermark("purchase_ts", lateness) else p0
    v.join(p, expr(
      s"user_id = p_user AND purchase_ts >= view_ts " +
        s"AND purchase_ts <= view_ts + interval $maxLag"), joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts"))).as("lag_us"),
        col("purchase_value"))
  }

  /** LEFT OUTER stream-stream join: every view emits — converted ones
    * with their purchase, unconverted ones null-padded ONCE the
    * watermark passes `view_ts + maxLag` (only then can the engine
    * prove no match is still coming; the emission is late by design,
    * not a bug). Unmatched-side state stays watermark-bounded exactly
    * as in the inner form. This is the conversion-funnel shape where
    * the non-converting majority is the signal. */
  def attributionJoinOuter(views: DataFrame, purchases: DataFrame,
      maxLag: String = "2 hours", lateness: String = "10 minutes",
      watermarked: Boolean = true): DataFrame =
    attributionJoin(views, purchases, maxLag, lateness, watermarked,
      joinType = "left_outer")
      .withColumn("converted", col("purchase_id").isNotNull)

  /** Stream-static enrichment join + windowed rollup — the most common
    * streaming shape of all: every event joins a (slowly-changing)
    * dimension and rolls up per (window, dim attribute). The dim side
    * is BROADCAST, so each micro-batch is a map-side hash join — the
    * stream never shuffles against the dimension, and state is
    * windows × attribute values, bounded by the watermark. `dim` must
    * expose `eventKey` (join key, pre-renamed) and `dimAttr`; the
    * summed measure column is `valueCol`. */
  def staticEnrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimAttr: String, tsCol: String = "ev_ts", window_ : String = "1 hour",
      lateness: String = "10 minutes", watermarked: Boolean = true,
      valueCol: String = "value"): DataFrame = {
    val in = if (watermarked) events.withWatermark(tsCol, lateness) else events
    in.join(broadcast(dim.select(col(eventKey), col(dimAttr))), Seq(eventKey))
      .groupBy(window(col(tsCol), window_), col(dimAttr))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,6)")).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col(dimAttr), col("n"), col("total_value"))
  }

  /** At-least-once → exactly-once: drop redelivered events by id.
    * Streaming form uses `dropDuplicatesWithinWatermark`, so the
    * dedup state store holds only ids younger than the watermark
    * horizon (bounded by rate × lateness — at 100 TB/day the
    * unbounded `dropDuplicates` state would grow forever; this one
    * can't). Batch form is a plain id-dedup: redelivered copies are
    * byte-identical, so keep-any is deterministic in content. */
  def exactlyOnce(events: DataFrame, idCol: String = "event_id",
      tsCol: String = "ev_ts", lateness: String = "10 minutes",
      watermarked: Boolean = true): DataFrame =
    if (watermarked) {
      events.withWatermark(tsCol, lateness)
        .dropDuplicatesWithinWatermark(idCol)
    } else {
      events.dropDuplicates(idCol)
    }

  /** S10: the reference's ≥0.1 s write throttle, expressed as a
    * ProcessingTime trigger + foreachBatch
    * (F1-25_Telemetry_DB_Record.py:181-191). The batchFn receives each
    * micro-batch; idempotence across retries is the caller's contract
    * (append with batchId dedup, or overwrite-by-partition). */
  def throttledSink(df: DataFrame, intervalMs: Long)(
      batchFn: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .trigger(Trigger.ProcessingTime(s"$intervalMs milliseconds"))
      .foreachBatch(batchFn)

  /** Convenience: run a stream of decoded packets through the merge and
    * into a parquet session log (the live_race_data equivalent). */
  def recordSession(merged: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    merged.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .outputMode("append")
      .start()
}
