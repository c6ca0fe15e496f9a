package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.sources.Expectations
import graft.sources.Expectations.Rule

/** Zero-cost streaming quality telemetry via `Dataset.observe` — the
  * Spark-native way to count rows/violations per micro-batch WITHOUT a
  * second aggregation pass: observed metrics are accumulator-backed,
  * computed as rows flow through the existing plan, and surfaced on
  * each `StreamingQueryProgress`.
  *
  * This is the monitoring face of [[ValidatedIngest]]: routing decides
  * where rows go, observation tells the operator what's flowing — at
  * 100 TB/day the difference between "the quarantine exists" and "the
  * violation RATE jumped at 14:00" is this listener.
  *
  * The listener keeps a bounded ring of per-batch readings (driver
  * memory is O(window), not O(stream lifetime)).
  */
object StreamMetrics {

  /** One batch's quality reading. */
  case class Reading(batchId: Long, rows: Long, violations: Long)

  /** Tag a streaming frame with observed rows/violation counters
    * derived from the row-scoped expectation rules. */
  def observeQuality(df: DataFrame, name: String,
      rules: Seq[Rule]): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      sum(when(!Expectations.rowPredicate(rules), 1L).otherwise(0L))
        .as("violations"))

  /** Listener collecting the observed metrics for `name`; attach with
    * `spark.streams.addListener`, detach with `removeListener`. */
  final class QualityListener(name: String, keep: Int = 256)
      extends StreamingQueryListener {
    private val buf = mutable.ArrayDeque.empty[Reading]

    def readings: Seq[Reading] = buf.synchronized(buf.toSeq)

    /** Violation rate over the retained window (None until data). */
    def violationRate: Option[Double] = buf.synchronized {
      val rows = buf.map(_.rows).sum
      if (rows == 0) None else Some(buf.map(_.violations).sum.toDouble / rows)
    }

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics.get(name)
      if (m != null) buf.synchronized {
        buf.append(Reading(e.progress.batchId,
          m.getAs[Long]("rows"), m.getAs[Long]("violations")))
        while (buf.size > keep) buf.removeHead()
      }
    }
  }

  /** Convenience: attach a fresh listener for `name`. */
  def listen(spark: SparkSession, name: String,
      keep: Int = 256): QualityListener = {
    val l = new QualityListener(name, keep)
    spark.streams.addListener(l)
    l
  }
}
