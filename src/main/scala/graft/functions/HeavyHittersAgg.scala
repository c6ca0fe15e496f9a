package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters as a typed `Aggregator`: frequent items
  * over an unbounded key domain in O(capacity) memory per group —
  * the sketch complement to the library's HLL (distinct counts) and
  * GK (quantiles) paths. An exact `groupBy(key).count` shuffles every
  * distinct key; the sketch's partial buffers hold ≤ `capacity`
  * counters per task and merge associatively, so the shuffle carries
  * sketches, not the key universe — the difference between feasible
  * and not at a 100 TB key column.
  *
  * Guarantees (standard MG): any item with true frequency
  * > n/(capacity+1) is present in the output, and each reported count
  * undercounts by at most n/(capacity+1). With capacity ≥ the number
  * of distinct items no decrements ever happen and counts are EXACT —
  * the anchor the gate uses (its oracle is a plain GROUP BY count).
  */
object HeavyHittersAgg {

  case class Item(item: String)

  class HeavyHitters(capacity: Int)
      extends Aggregator[Item, Map[String, Long], Map[String, Long]] {
    require(capacity > 0)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], in: Item): Map[String, Long] =
      addCount(buf, in.item, 1L)

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (acc, (k, v)) => addCount(acc, k, v) }

    /** MG insert generalized to weighted adds (needed for merge):
      * add, then if over capacity decrement all by the (capacity+1)th
      * largest count and drop non-positives. */
    private def addCount(buf: Map[String, Long], k: String, w: Long): Map[String, Long] = {
      val grown = buf.updated(k, buf.getOrElse(k, 0L) + w)
      if (grown.size <= capacity) grown
      else {
        val cut = grown.valuesIterator.toSeq.sorted.apply(grown.size - capacity - 1)
        grown.collect { case (key, c) if c - cut > 0 => key -> (c - cut) }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** UDAF form: `heavyHitters(16)(col("item"))`. */
  def heavyHitters(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new HeavyHitters(capacity), Encoders.product[Item])
}
