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
    val rows = KmvSketch.pairwiseMatrix((a ++ b ++ c).toDF("grp", "k"),
      "grp", "k").collect()
    val out = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("est_inter_e6"), r.getAs[Long]("jaccard_e6"),
        r.getAs[Long]("n_inter_exact"))).toMap
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
    // difference + containment in the exact regime: A∖B = 70, B∖A = 50,
    // |A∩B|/|A| = 30/100, |A∩B|/|B| = 30/80 — and A ⊆ C pins the
    // containment-direction asymmetry (cont(A in C) = 1, cont(C in A) ≪ 1)
    val ab = rows.find(r => r.getString(0) == "A" && r.getString(1) == "B").get
    assert(ab.getAs[Long]("est_diff_ab_e6") === 70L * 1000000)
    assert(ab.getAs[Long]("est_diff_ba_e6") === 50L * 1000000)
    assert(ab.getAs[Long]("cont_a_e6") === 300000L)
    assert(ab.getAs[Long]("cont_b_e6") === 375000L)
    val ac = rows.find(r => r.getString(0) == "A" && r.getString(1) == "C").get
    val contAinC = ac.getAs[Long]("cont_a_e6") / 1e6
    val contCinA = ac.getAs[Long]("cont_b_e6") / 1e6
    assert(contAinC > 0.7, s"cont(A in C) $contAinC should be near 1")
    assert(contCinA < 0.3, s"cont(C in A) $contCinA should be near 0.1")
    assert(contAinC > contCinA)
  }

  test("difference and containment estimates: exact collapse and estimator class") {
    // exact regime (A∪B = 150 < k): one formula, exact values
    val ex = KmvSketch.intersectEstimate(synth(100, 80, 30),
      "grp", "k", "A", "B").head()
    assert(ex.getAs[Long]("est_diff_ab_e6") === 70L * 1000000)
    assert(ex.getAs[Long]("est_diff_ba_e6") === 50L * 1000000)
    assert(ex.getAs[Long]("cont_a_e6") === 300000L) // 30/100
    assert(ex.getAs[Long]("cont_b_e6") === 375000L) // 30/80 — asymmetric
    // estimator regime: |A∖B| = 4000, |B∖A| = 3000, |A∩B|/|A| = 0.2
    val est = KmvSketch.intersectEstimate(synth(5000, 4000, 1000),
      "grp", "k", "A", "B").head()
    assert(math.abs(est.getAs[Long]("est_diff_ab_e6") / 1e6 / 4000 - 1) < 0.5)
    assert(math.abs(est.getAs[Long]("est_diff_ba_e6") / 1e6 / 3000 - 1) < 0.5)
    assert(math.abs(est.getAs[Long]("cont_a_e6") / 1e6 - 0.2) < 0.15)
  }

  test("degenerate inputs yield NULL estimators, never a division error") {
    import spark.implicits._
    // one-sided: grp B absent — its d/hk/est/cont columns are NULL,
    // the A-side and union/intersection columns still bind
    val one = KmvSketch.intersectEstimate(
      (1 to 50).map(i => ("A", i.toLong)).toDF("grp", "k"),
      "grp", "k", "A", "B").head()
    assert(one.isNullAt(one.fieldIndex("d_b")))
    assert(one.isNullAt(one.fieldIndex("est_b_e6")))
    assert(one.isNullAt(one.fieldIndex("cont_b_e6")))
    assert(one.getAs[Long]("est_a_e6") === 50L * 1000000)
    assert(one.getAs[Long]("est_inter_e6") === 0L)
    assert(one.getAs[Long]("jaccard_e6") === 0L)
    assert(one.getAs[Long]("cont_a_e6") === 0L)
    // fully empty input: n_u = 0 — every ratio column is NULL (the
    // r12 ADVICE shape: 'matches * 1e6 div n_u' used to throw/NULL
    // confusingly under ANSI), and nothing errors
    val empty = KmvSketch.intersectEstimate(
      Seq.empty[(String, Long)].toDF("grp", "k"), "grp", "k", "A", "B").head()
    assert(empty.isNullAt(empty.fieldIndex("est_inter_e6")))
    assert(empty.isNullAt(empty.fieldIndex("jaccard_e6")))
    assert(empty.isNullAt(empty.fieldIndex("cont_a_e6")))
    assert(empty.getAs[Long]("n_inter_exact") === 0L)
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
