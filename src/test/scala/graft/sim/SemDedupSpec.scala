package graft.sim

import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Two tight direction groups plus isolated vectors: within-group
    * cosines ≈ 1, cross-group ≈ 0. */
  private def corpus() = {
    def v(base: Array[Float], wiggle: Float, d: Int = 8) =
      base.zipWithIndex.map { case (x, i) => x + (if (i == 0) wiggle else 0f) }
    // interleaved ids so the first-k-by-id seed rule picks one seed
    // per direction group (seeding granularity bounds what semantic
    // dedup can collapse — a fixture with all seeds in one group
    // correctly splits that group across clusters)
    val a = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val groupA = Seq(1L, 3L, 5L, 7L, 9L).zipWithIndex
      .map { case (id, i) => (id, v(a, (i + 1) * 0.001f)) }
    val groupB = Seq(2L, 4L, 6L, 8L, 10L).zipWithIndex
      .map { case (id, i) => (id, v(b, (i + 1) * 0.001f)) }
    val lone = Seq((21L, Array(0f, 0f, 1f, 1f, 0f, 0f, 0f, 0f)),
      (22L, Array(0f, 0f, 1f, -1f, 0f, 0f, 0f, 0f)))
    (groupA ++ groupB ++ lone).toDF("vec_id", "embedding")
  }

  test("near-identical vectors collapse to the lowest id; distinct survive") {
    val out = SemDedup.dedup(corpus(), k = 2, iters = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 12)
    // each tight group keeps exactly its lowest id
    assert(out(1L), "group A canonical kept")
    assert(Seq(3L, 5L, 7L, 9L).forall(i => !out(i)), "group A dups dropped")
    assert(out(2L), "group B canonical kept")
    assert(Seq(4L, 6L, 8L, 10L).forall(i => !out(i)), "group B dups dropped")
    // orthogonal-ish singletons survive even if co-clustered
    assert(out(21L) && out(22L))
  }

  test("deterministic under repartitioning") {
    val df = corpus()
    val a = SemDedup.dedup(df.repartition(1), k = 2, iters = 2, tau = 0.9)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = SemDedup.dedup(df.repartition(7), k = 2, iters = 2, tau = 0.9)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("tau = high keeps everything except exact-direction copies") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),   // exact copy of 1
      (3L, Array(0.7f, 0.7f, 0f, 0f, 0f, 0f, 0f, 0f)) // 45 degrees off
    ).toDF("vec_id", "embedding")
    val out = SemDedup.dedup(df, k = 1, iters = 1, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L) && out(3L))
  }
}
