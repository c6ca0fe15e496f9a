package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, CaseWhen, Cast, Concat, CreateMap, Divide, EqualTo,
  Explode, Expression, Floor, GreaterThan, GreaterThanOrEqual,
  LessThanOrEqual, Literal, RaiseError, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType,
  LongType, StringType}

/** Optimizer rule: an inner join whose ONLY predicate is a range
  * containment `p >= lo AND p <= hi` (point from one side, interval
  * from the other) has no equi keys, so Spark plans a
  * BroadcastNestedLoopJoin — O(n·m) compares and a broadcast of a
  * whole side. With a bin width configured
  * (`spark.graft.rangeJoin.binWidth`, in axis units), this rule
  * rewrites the logical join into the binned form of
  * [[graft.ops.RangeJoin]]: the interval side explodes to the bins it
  * overlaps, the point side maps to its single bin, and the join
  * becomes a shuffled equi-join on the bin id with the exact range
  * predicate kept as a post-condition. Same rows, no nested loop —
  * the rewrite Databricks ships as "range join optimization", here as
  * a ~60-line injected rule.
  *
  * Scope guards: inner joins; integral (int/long) axis; the rule
  * leaves joins that already have an equi predicate alone (Spark
  * hash-joins those with the range as a post-filter) and never fires
  * on its own output (the `__graft_bin` marker).
  *
  * Runtime guards on the generator (an unguarded
  * `Sequence(bin(lo), bin(hi))` is a landmine): an interval with
  * lo > hi would make Spark's Sequence default its step to -1 and
  * materialize the full DESCENDING bin array — correct rows (the
  * retained exact predicate rejects them) but arbitrarily large — so
  * inverted intervals now explode to an EMPTY array (matching
  * nothing, same semantics, zero bytes). And an interval spanning
  * more than `spark.graft.rangeJoin.maxBins` bins (default 65536 —
  * a sentinel bound like year-9999 over a day-grid) raises a clear
  * error naming the span and the fix (wider bins) instead of silently
  * OOM-ing an executor on a per-row gigabyte array.
  */
object BinRangeJoin extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.binWidth"
  val MaxBinsConf = "spark.graft.rangeJoin.maxBins"
  private val BinL = "__graft_bin_l"
  private val BinR = "__graft_bin_r"

  private def width: Long =
    try conf.getConfString(WidthConf, "0").toLong catch {
      case _: NumberFormatException => 0L
    }

  private def maxBins: Long =
    try conf.getConfString(MaxBinsConf, "65536").toLong catch {
      case _: NumberFormatException => 65536L
    }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  /** (point, lo, hi) if cond is exactly the containment conjunction
    * with point from `left` and bounds from `right`. */
  private def containment(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))
          if p1.semanticEquals(p2) &&
            p1.references.subsetOf(left.outputSet) &&
            lo.references.subsetOf(right.outputSet) &&
            hi.references.subsetOf(right.outputSet) &&
            lo.references.nonEmpty && hi.references.nonEmpty &&
            p1.references.nonEmpty &&
            Seq(p1, lo, hi).forall(integral) =>
        Some((p1, lo, hi))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.exists(_.isInstanceOf[EqualTo]) &&
            j.output.forall(a => a.name != BinL && a.name != BinR) =>
        containment(cond, left, right) match {
          case Some((p, lo, hi)) =>
            val binAlias = Alias(bin(p, w), BinL)()
            val newLeft = Project(left.output :+ binAlias, left)
            val binR = AttributeReference(BinR, LongType, nullable = false)()
            val binLo = bin(lo, w)
            val binHi = bin(hi, w)
            val mb = maxBins
            // span measured in DOUBLE: a raw long `binHi - binLo`
            // overflows on sentinel bounds (lo = Long.MinValue as
            // "unbounded"), wraps negative, and would BYPASS this very
            // guard; double subtraction keeps the magnitude (precision
            // loss near the threshold is irrelevant for a resource cap)
            val spanD = Subtract(Cast(binHi, DoubleType), Cast(binLo, DoubleType))
            val overflowMsg = Concat(Seq(
              Literal("graft BinRangeJoin: interval explodes to "),
              Cast(spanD, StringType),
              Literal(s"+1 bins > $MaxBinsConf=$mb; widen $WidthConf " +
                "or raise the cap")))
            val guardedBins = CaseWhen(Seq(
              // inverted interval → empty (Sequence would DESCEND)
              (GreaterThan(binLo, binHi),
                Literal.create(Array.empty[Long],
                  ArrayType(LongType, containsNull = false))),
              // absurd span → fail loudly instead of a per-row OOM
              (GreaterThanOrEqual(spanD, Literal(mb.toDouble)),
                new RaiseError(Literal("USER_RAISED_EXCEPTION"),
                  CreateMap(Seq(Literal("errorMessage"), overflowMsg)),
                  ArrayType(LongType, containsNull = false)))),
              // Sequence is timezone-aware: unresolved until tz is set
              Sequence(binLo, binHi, None, Some(conf.sessionLocalTimeZone)))
            val newRight = Generate(
              Explode(guardedBins),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binR), child = right)
            val newCond = And(EqualTo(binAlias.toAttribute, binR), cond)
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
