package graft.ml

import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val d = 8
  // points spread along u with strong variance, small isotropic noise
  private val u: Array[Double] = {
    val raw = Array(3.0, 1.0, -2.0, 0.5, 0.0, 1.5, -1.0, 0.25)
    val n = math.sqrt(raw.map(x => x * x).sum); raw.map(_ / n)
  }
  private def mkData(n: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(11)
    (1 to n).map { _ =>
      val t = rnd.nextGaussian() * 5
      Array.tabulate(d)(i => (t * u(i) + rnd.nextGaussian() * 0.05).toFloat)
    }
  }

  test("recovers a planted principal direction, ordered and orthogonal") {
    val ds = spark.createDataset(mkData(400))
    val m = Pca.fit(ds, k = 3)
    val pc1 = m.components(0)
    val cos = math.abs(pc1.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"PC1 aligns with planted direction, cos=$cos")
    assert(m.eigenvalues(0) > m.eigenvalues(1) &&
      m.eigenvalues(1) >= m.eigenvalues(2), "eigenvalue ordering")
    val dot01 = m.components(0).zip(m.components(1))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(dot01) < 1e-6, "orthogonal components")
    assert(m.eigenvalues(0) / m.totalVar > 0.95,
      "planted direction carries the variance")
  }

  test("fit is EXACTLY partition-invariant (quantized sums)") {
    val data = mkData(200)
    val a = Pca.fit(spark.createDataset(data).repartition(1), k = 2)
    val b = Pca.fit(spark.createDataset(data).repartition(7), k = 2)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }

  test("projection: pc1 variance dominates and matches eigenvalue scale") {
    val data = mkData(300)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df.select("embedding").as[Array[Float]], k = 2)
    val proj = Pca.project(df, "embedding", m).collect()
    def variance(xs: Array[Double]) = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val v1 = variance(proj.map(_.getDouble(1)))
    val v2 = variance(proj.map(_.getDouble(2)))
    assert(v1 > 10 * v2, "projected variance concentrated in pc1")
    assert(math.abs(v1 - m.eigenvalues(0)) / m.eigenvalues(0) < 0.05,
      "projected variance ~ eigenvalue")
  }

  test("model frame shape and explained ratios") {
    val ds = spark.createDataset(mkData(100))
    val m = Pca.fit(ds, k = 2)
    val mf = Pca.modelFrame(spark, m)
    assert(mf.count() == 2L * d)
    val ratios = mf.select("component", "explained_ratio").distinct()
      .collect().map(_.getDouble(1))
    assert(ratios.forall(r => r >= 0 && r <= 1.0 + 1e-9))
  }
}
