package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity for the r12 sketch kernels: each distributed
  * path must equal a definitional in-memory reference on seeded
  * random inputs (duplicates, negatives, magnitude sweeps, random
  * partitioning). Failures reproduce. */
class SketchKernelPropSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("MinKAgg equals sorted-distinct-take-k on random partitioned streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 4) {
      val k = Seq(1, 3, 16, 200)(trial - 1)
      val n = 50 + rnd.nextInt(2000)
      val vals = Seq.fill(n)(rnd.nextLong() >> rnd.nextInt(48))
      val got = vals.toDF("h").repartition(1 + rnd.nextInt(7))
        .agg(graft.functions.MinKAgg.minK(k)(col("h")))
        .head().getSeq[Long](0)
      assert(got === vals.distinct.sorted.take(k), s"trial $trial k=$k")
    }
  }

  test("HDR bucket expression equals the reference across magnitudes and k") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    for (k <- Seq(2, 5, 8)) {
      // signed since r13 (negatives mirror-map); Long.MinValue is the
      // one excluded point (its negation overflows, loudly)
      val xs = Seq.fill(400)(rnd.nextLong() >> rnd.nextInt(62))
        .filter(_ != Long.MinValue) ++
        (-2L * (1 << (k + 1)) to 2L * (1 << (k + 1)))
      val got = HdrHistogram.histogram(
        xs.distinct.toDF("x").withColumn("g", concat(lit("v"), col("x"))),
        "g", "x", k).collect()
        .map(r => r.getString(0).drop(1).toLong -> r.getLong(1)).toMap
      xs.distinct.foreach { x =>
        assert(got(x) === HdrHistogram.bucketLoRef(x, k), s"k=$k x=$x")
      }
    }
  }

  test("HLL register index/rank expressions equal the reference over the engine's own hashes") {
    import spark.implicits._
    import HllKernel.{M, MaxRank, P}
    val rnd = new scala.util.Random(20260818L)
    val keys = Seq.fill(3000)(rnd.nextLong())
    // ground truth: Spark's own xxhash64 values, then idx/rank in Scala
    val hashes = keys.toDF("k").select(col("k"), xxhash64(col("k")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = hashes.values
      .map { h =>
        val idx = h & (M - 1)
        val v = h >>> P
        val rank = if (v == 0) MaxRank else MaxRank - (64 - java.lang.Long.numberOfLeadingZeros(v))
        idx -> rank
      }
      .groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }
    val got = HllKernel.registers(
      keys.toDF("k").withColumn("g", lit("g")), "g", "k")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(got === ref)
  }

  test("KMV sketches equal sorted-distinct-take-k of the engine's own hashes") {
    import spark.implicits._
    import KmvSketch.K
    val rnd = new scala.util.Random(20260819L)
    val rows = Seq.fill(4000)((Seq("A", "B")(rnd.nextInt(2)), rnd.nextInt(900).toLong))
    val hashed = rows.toDF("grp", "k")
      .select(col("grp"), col("k"), xxhash64(col("k")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val ref = hashed.groupBy(_._1).map { case (g, hs) =>
      g -> hs.map(_._2).distinct.sorted.take(K).toSeq
    }
    val got = KmvSketch.sketches(rows.toDF("grp", "k"), "grp", "k")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got === ref)
  }
}
