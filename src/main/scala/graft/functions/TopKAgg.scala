package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-buffer per-group top-k as a typed `Aggregator` — the
  * scale-correct alternative to `row_number().over(...) <= k`, whose
  * physical plan SORTS every group's full row set. This aggregator
  * keeps at most k (value, id) pairs per group in each task's partial
  * buffer, so the map side combines before the shuffle (the shuffle
  * carries ≤ k rows per group per task, not the whole table) and no
  * global sort ever happens. Ordering is value DESC with id ASC
  * tie-break, so results are deterministic on duplicated values.
  *
  * Buffers are tiny sorted vectors (k is single-digit in practice);
  * merge is a linear sorted-merge + truncate. Registered as a UDAF it
  * drops into ordinary `agg(...)` calls and Catalyst plans it as a
  * regular partial+final ObjectHashAggregate.
  */
object TopKAgg {

  case class ValueKey(value: Double, id: Long)

  class TopK(k: Int) extends Aggregator[ValueKey, Seq[ValueKey], Seq[ValueKey]] {
    require(k > 0)

    private def lt(a: ValueKey, b: ValueKey): Boolean =
      a.value > b.value || (a.value == b.value && a.id < b.id)

    override def zero: Seq[ValueKey] = Vector.empty

    override def reduce(buf: Seq[ValueKey], in: ValueKey): Seq[ValueKey] = {
      if (buf.size == k && !lt(in, buf.last)) buf
      else {
        val i = buf.indexWhere(e => lt(in, e)) match {
          case -1 => buf.size
          case n => n
        }
        (buf.take(i) :+ in) ++ buf.drop(i) take k
      }
    }

    override def merge(a: Seq[ValueKey], b: Seq[ValueKey]): Seq[ValueKey] = {
      val out = Vector.newBuilder[ValueKey]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && lt(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(r: Seq[ValueKey]): Seq[ValueKey] = r

    override def bufferEncoder: Encoder[Seq[ValueKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ValueKey]]()

    override def outputEncoder: Encoder[Seq[ValueKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ValueKey]]()
  }

  /** UDAF form: `topK(5)(col("value"), col("id"))` — the case-class
    * input is flattened to (value: double, id: long) arguments. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopK(k), Encoders.product[ValueKey])
}
