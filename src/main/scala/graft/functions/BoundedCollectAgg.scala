package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Skew-safe `collect_list` with a hard per-group buffer cap — the
  * inverted-index primitive behind blocked dedup candidate generation
  * (mirrors the rare-token posting-list cap in Lee et al.'s dedup
  * pipelines; reference behavior: F3ZLoV fuzzy-dup notebooks block on
  * rare tokens only).
  *
  * The built-in `collect_list` materializes EVERY group member in the
  * aggregation buffer, so a stop-gram whose document frequency is the
  * corpus size turns one group into an executor-OOM hot key at 100 TB.
  * This aggregator stops appending once the buffer holds `cap`
  * elements, and `finish` returns NULL for any group that reached the
  * cap — so the output is exactly "the COMPLETE list when the group's
  * true cardinality is < cap, NULL otherwise", at O(cap) state per
  * group regardless of skew. Partial (map-side) buffers combine before
  * the shuffle, so the shuffle carries ≤ cap longs per group per task.
  *
  * Which elements survive in a saturated buffer is partition-order
  * dependent, which is why truncated content must never escape: the
  * NULL-on-saturation finish enforces that contract in the type (a
  * caller filtering on, say, `size <= cap` simply drops the NULL rows
  * instead of silently consuming partition-order-dependent lists).
  * `filter(size(ids) BETWEEN 2 AND cap-1)` over this aggregate is
  * value-identical to the same filter over true `collect_list`.
  */
object BoundedCollectAgg {

  class BoundedCollect(cap: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(cap > 0)

    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
      if (buf.size >= cap) buf else buf :+ in

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.size >= cap) a
      else if (b.size >= cap) b
      else (a ++ b) take cap

    // NULL for saturated groups: their buffer content is partition-
    // order dependent and must not be observable downstream.
    override def finish(r: Seq[Long]): Seq[Long] =
      if (r.size >= cap) null else r

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `boundedCollect(cap)(col)` in an `agg(...)`. */
  def boundedCollect(cap: Int)(c: Column): Column =
    udaf(new BoundedCollect(cap), Encoders.scalaLong).apply(c)
}
