package graft.sim

import org.scalatest.funsuite.AnyFunSuite

class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val d = 16
  private val rnd = new scala.util.Random(7)
  private def vec() = Array.fill(d)(rnd.nextFloat() * 2 - 1)

  test("sign matrix is deterministic and roughly balanced") {
    val signs = for (i <- 0 until 64; j <- 0 until 8) yield RandomProjection.sign(i, j)
    assert(signs.forall(s => s == 1 || s == -1))
    val pos = signs.count(_ == 1)
    assert(pos > signs.size / 3 && pos < 2 * signs.size / 3, s"balanced-ish, got $pos/${signs.size}")
    assert(RandomProjection.sign(3, 5) == RandomProjection.sign(3, 5))
  }

  test("projection is linear: p(x+y) = p(x) + p(y) up to rounding") {
    val x = vec(); val y = vec()
    val xy = x.zip(y).map { case (a, b) => a + b }
    val df = Seq((1L, x), (2L, y), (3L, xy)).toDF("vec_id", "embedding")
    val rows = RandomProjection.project(df, "embedding", d, 4)
      .orderBy("vec_id").collect()
    for (j <- 1 to 4) {
      val px = rows(0).getDouble(j); val py = rows(1).getDouble(j)
      val pxy = rows(2).getDouble(j)
      assert(math.abs(pxy - (px + py)) < 1e-5, s"linearity in p${j - 1}")
    }
  }

  test("JL: pairwise distances are preserved within loose distortion on average") {
    val vecs = (1 to 40).map(i => (i.toLong, vec()))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = RandomProjection.project(df, "embedding", d, 8)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getDouble).toArray).toMap
    def dist(a: Array[Float], b: Array[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    def distP(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      (i, vi) <- vecs; (j, vj) <- vecs if i < j
    } yield distP(proj(i), proj(j)) / dist(vi, vj)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"expected ~1, got $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.5) > ratios.size * 9 / 10,
      "distortion tail bounded")
  }

  test("projection invariant to partitioning") {
    val df = (1 to 30).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
    val a = RandomProjection.project(df.repartition(1), "embedding", d, 4)
      .orderBy("vec_id").collect().map(_.toSeq)
    val b = RandomProjection.project(df.repartition(6), "embedding", d, 4)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
