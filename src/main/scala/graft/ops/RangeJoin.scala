package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join: `points` rows whose point value falls
  * inside a `[lo, hi]` interval of `intervals`, WITHOUT the
  * BroadcastNestedLoopJoin Spark plans for a bare non-equi condition.
  *
  * Shape: both sides map to integer bin ids on a shared fixed-width
  * grid; an interval is exploded to the (few) bins it overlaps, a
  * point belongs to exactly one bin, and the join becomes an ordinary
  * shuffled equi-join on `__bin` followed by the exact range filter.
  * Because a point lives in exactly one bin, no post-join dedup is
  * needed — each qualifying (point, interval) pair appears exactly
  * once. At 100 TB both sides shuffle once on the bin key and the
  * per-task work is bounded by bin population, not n×m; bin width
  * trades explode factor against join fan-in (pick ≈ the typical
  * interval length so intervals explode to ~2 bins).
  *
  * The reference never needs a range join (its distance resample turns
  * the natural as-of/range problem into equi-joins — reference
  * README.md:36-41); this is the general operator a reference user
  * gets for interval semantics the 10 m grid can't express.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where
    * `lo <= point <= hi`, all three being timestamp/numeric columns
    * mapped to bins by `bin` (a monotone long-valued mapping; the same
    * function is applied to point, lo, and hi). Input frames must have
    * disjoint column names.
    *
    * Generator guards: an inverted interval (lo > hi) explodes to an
    * EMPTY bin array — a bare `sequence(binLo, binHi)` would default
    * its step to -1 and materialize the full descending array (correct
    * rows after the exact filter, but arbitrarily large). An interval
    * spanning ≥ `maxBins` bins (a sentinel bound like year-9999 on a
    * day grid) raises a clear error naming the span and the fix,
    * instead of silently building a per-row gigabyte array. */
  def binned(points: DataFrame, pointCol: Column,
      intervals: DataFrame, loCol: Column, hiCol: Column,
      bin: Column => Column, maxBins: Long = 65536L): DataFrame = {
    val p = points.withColumn("__bin", bin(pointCol))
    val binLo = bin(loCol)
    val binHi = bin(hiCol)
    // span in DOUBLE: raw long subtraction overflows on sentinel
    // bounds (lo = Long.MinValue) and would bypass the cap
    val spanD = binHi.cast("double") - binLo.cast("double")
    val guarded =
      when(binLo > binHi, array().cast("array<bigint>"))
        .when(spanD >= maxBins.toDouble,
          raise_error(concat(
            lit("graft RangeJoin.binned: interval explodes to "),
            spanD.cast("string"),
            lit(s"+1 bins > maxBins=$maxBins; widen the bin or raise the cap")))
            .cast("array<bigint>"))
        .otherwise(sequence(binLo, binHi))
    val iv = intervals.withColumn("__bin", explode(guarded))
    p.join(iv, "__bin")
      .filter(pointCol >= loCol && pointCol <= hiCol)
      .drop("__bin")
  }

  /** A bin mapping for timestamp columns: `widthDays`-wide bins on the
    * epoch-day axis. */
  def timestampBins(widthDays: Int): Column => Column =
    ts => floor(unix_timestamp(ts) / lit(widthDays.toLong * 86400L)).cast("long")

  /** Interval×interval OVERLAP join (`aLo <= bHi AND bLo <= aHi`),
    * binned: both sides explode to their covered bins and equi-join on
    * the bin id — but a wide overlap covers MANY shared bins, so each
    * candidate pair is kept only in the bin containing its overlap
    * START (`greatest(aLo, bLo)`), which lies in exactly one bin that
    * both sides cover. Each overlapping pair therefore appears exactly
    * once with NO distinct/dedup pass — the dedup a naive
    * both-sides-exploded join would need is the expensive part at
    * scale, and this predicate replaces it with a per-row comparison.
    * Inverted/oversized intervals get the same guards as [[binned]].
    * Input frames must have disjoint column names. */
  def binnedOverlap(a: DataFrame, aLo: Column, aHi: Column,
      b: DataFrame, bLo: Column, bHi: Column,
      bin: Column => Column, maxBins: Long = 65536L): DataFrame = {
    def explodeBins(df: DataFrame, lo: Column, hi: Column): DataFrame = {
      val binLo = bin(lo)
      val binHi = bin(hi)
      val spanD = binHi.cast("double") - binLo.cast("double")
      df.withColumn("__bin", explode(
        when(binLo > binHi, array().cast("array<bigint>"))
          .when(spanD >= maxBins.toDouble,
            raise_error(concat(
              lit("graft RangeJoin.binnedOverlap: interval explodes to "),
              spanD.cast("string"),
              lit(s"+1 bins > maxBins=$maxBins; widen the bin or raise the cap")))
              .cast("array<bigint>"))
          .otherwise(sequence(binLo, binHi))))
    }
    explodeBins(a, aLo, aHi)
      .join(explodeBins(b, bLo, bHi), "__bin")
      .filter(aLo <= bHi && bLo <= aHi)
      .filter(col("__bin") === bin(greatest(aLo, bLo)))
      .drop("__bin")
  }
}
