package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import KmvSketch.K

  /** Synthetic two-group sets with a controlled overlap. */
  private def synth(nA: Int, nB: Int, shared: Int) = {
    import spark.implicits._
    val a = (1 to nA).map(i => ("A", i.toLong))
    val b = (1 to shared).map(i => ("B", i.toLong)) ++
      (1 to (nB - shared)).map(i => ("B", 1000000L + i))
    (a ++ b).toDF("grp", "k")
  }

  test("sketch merge across shards is BIT-identical to a rebuild") {
    val df = synth(5000, 4000, 1000)
    def skMap(d: org.apache.spark.sql.DataFrame) =
      KmvSketch.sketches(d, "grp", "k").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = skMap(df)
    val s1 = KmvSketch.sketches(df.filter(col("k") % 2 === 0), "grp", "k")
    val s2 = KmvSketch.sketches(df.filter(col("k") % 2 =!= 0), "grp", "k")
    // merge = re-aggregate the exploded shard sketches with the same
    // bounded MinKAgg (what a warehouse would run over STORED sketches)
    val merged = s1.union(s2)
      .select(col("grp"), explode(col("sk")).as("h"))
      .groupBy("grp")
      .agg(graft.functions.MinKAgg.minK(K)(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged === direct)
    assert(direct.values.forall(s => s.size == K && s == s.sorted))
  }

  test("distinct, union, and intersection estimates land in the KMV error class") {
    val (nA, nB, shared) = (5000, 4000, 1000)
    val out = KmvSketch.intersectEstimate(synth(nA, nB, shared),
      "grp", "k", "A", "B").head()
    val estA = out.getAs[Long]("est_a_e6") / 1e6
    val estB = out.getAs[Long]("est_b_e6") / 1e6
    val estU = out.getAs[Long]("est_union_e6") / 1e6
    val estI = out.getAs[Long]("est_inter_e6") / 1e6
    val nU = nA + nB - shared
    val rse = 1.0 / math.sqrt(K - 1.0)
    assert(math.abs(estA / nA - 1) < 3 * rse, s"est_a $estA vs $nA")
    assert(math.abs(estB / nB - 1) < 3 * rse, s"est_b $estB vs $nB")
    assert(math.abs(estU / nU - 1) < 3 * rse, s"est_union $estU vs $nU")
    // intersection inherits union noise + binomial matches noise
    assert(math.abs(estI / shared - 1) < 0.5, s"est_inter $estI vs $shared")
    assert(out.getAs[Long]("n_inter_exact") === shared.toLong)
  }

  test("non-full sketches collapse to EXACT set algebra") {
    // 100 + 80 distinct with 30 shared — everything under k=256, so
    // the one estimator formula must return exact counts in e6 units
    val out = KmvSketch.intersectEstimate(synth(100, 80, 30),
      "grp", "k", "A", "B").head()
    assert(out.getAs[Long]("est_a_e6") === 100L * 1000000)
    assert(out.getAs[Long]("est_b_e6") === 80L * 1000000)
    assert(out.getAs[Long]("est_union_e6") === 150L * 1000000)
    assert(out.getAs[Long]("est_inter_e6") === 30L * 1000000)
    assert(out.getAs[Long]("jaccard_e6") === 30L * 1000000 / 150)
    assert(out.getAs[Long]("n_inter_exact") === 30L)
  }

  test("pairwise overlap matrix: exact collapse under k, estimator class above") {
    import spark.implicits._
    // A∩B = 30 with A∪B = 150 < k (exact regime); C ⊇ A with
    // |A∪C| = 1000 > k (estimator regime at a 10% overlap ratio —
    // matches ~ Binomial(k, 0.1), σ_est ≈ 20, band 4σ)
    val a = (1 to 100).map(i => ("A", i.toLong))
    val b = (1 to 30).map(i => ("B", i.toLong)) ++
      (1 to 50).map(i => ("B", 50000L + i))
    val c = (1 to 100).map(i => ("C", i.toLong)) ++
      (1 to 900).map(i => ("C", 100000L + i))
    val out = KmvSketch.pairwiseMatrix((a ++ b ++ c).toDF("grp", "k"),
      "grp", "k")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    // exact regime: A∪B = 150 < k, so everything is exact set algebra
    val (abInter, abJac, abExact) = out(("A", "B"))
    assert(abExact === 30L && abInter === 30L * 1000000)
    assert(abJac === 30L * 1000000 / 150)
    // estimator regime: A⊆C gives true intersection 100; B∩C = 30
    val (acInter, _, acExact) = out(("A", "C"))
    assert(acExact === 100L)
    assert(math.abs(acInter / 1e6 - 100) < 80, s"A∩C est ${acInter / 1e6}")
    assert(out(("B", "C"))._3 === 30L)
  }

  test("MinKAgg keeps k smallest distinct values under duplication and order") {
    import spark.implicits._
    val vals = Seq(5L, 3L, 3L, 9L, -7L, 5L, 0L, -7L, 12L, 1L)
    val got = vals.toDF("h").repartition(4)
      .agg(graft.functions.MinKAgg.minK(4)(col("h")))
      .head().getSeq[Long](0)
    assert(got === Seq(-7L, 0L, 1L, 3L))
  }
}
