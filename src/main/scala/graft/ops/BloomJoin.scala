package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.{BloomFilterAgg, BloomMightContainLong}

/** Bloom-pruned join — semi-join reduction, the standard 100 TB move
  * when a selective dimension filters a huge fact join: distill the
  * small side's join keys into a Bloom filter (one pass, distributed
  * build), then drop non-matching fact rows AT THE SCAN, before they
  * ever reach the shuffle. The filter has no false negatives, and its
  * ~fpp false positives are eliminated by the join itself — so the
  * result is EXACTLY the plain join while the shuffle carries
  * ~match-volume instead of fact-volume. (Spark's own runtime bloom
  * rewrite exists but only fires under size heuristics; this operator
  * is the explicit, predictable form, built on the same native
  * codegen'd membership expression as incremental dedup.)
  */
object BloomJoin {

  /** The pruned big side alone: `big` filtered by the small side's key
    * bloom (true matches + ~fpp false positives survive). */
  def prunedScan(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expected: Long, fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val agg = udaf(new BloomFilterAgg(math.max(expected, 1L), fpp),
      Encoders.scalaLong)
    val bytes = small.agg(agg(col(smallKey).cast("long")).as("bf"))
      .head().getAs[Array[Byte]](0)
    val fn = BloomMightContainLong.registerUnique(spark, bytes)
    big.filter(expr(s"$fn(cast($bigKey as long))"))
  }

  /** `big ⋈ small` on `bigKey = smallKey` (long-castable keys), with
    * the big side bloom-pruned before the shuffle. `expected` sizes
    * the filter (small-side key cardinality or an upper bound). */
  def pruned(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expected: Long, fpp: Double = 0.01): DataFrame =
    prunedScan(big, small, bigKey, smallKey, expected, fpp)
      .join(small, col(bigKey) === col(smallKey))
}
