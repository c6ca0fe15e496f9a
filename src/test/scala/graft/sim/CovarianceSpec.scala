package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CovarianceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getInt(0), r.getInt(1), r.getInt(2)) ->
      ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

  test("one-pass mergeable aggregator equals the declarative join exactly") {
    val decl = Covariance.sufficientStats(emb).collect().map(key).toMap
    val onePass = Covariance.sufficientStatsOnePass(emb).collect().map(key).toMap
    assert(decl.nonEmpty)
    assert(onePass === decl)
  }

  test("hand-computed stats on a tiny frame; diagonal variance non-negative") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 2.0f), 3),
      (2L, Array(3.0f, 4.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = Covariance.sufficientStats(tiny).collect().map(key).toMap
    // micro-units: [1e6,2e6] and [3e6,4e6]
    assert(got((3, 0, 0)) === ((2L, 4000000L, 4000000L, 10000000000000L)))
    assert(got((3, 0, 1)) === ((2L, 4000000L, 6000000L, 14000000000000L)))
    assert(got((3, 1, 1)) === ((2L, 6000000L, 6000000L, 20000000000000L)))
    // derived covariance is exact here: cov(0,1) = (2·14e12 − 4e6·6e6)/4 = 1e12
    val (n, si, sj, sij) = got((3, 0, 1))
    assert(n * sij - si * sj === 4000000000000L)
    // real corpus: every diagonal's n·s_ii − s_i² ≥ 0 (variance)
    Covariance.sufficientStats(emb)
      .filter(col("dim_i") === col("dim_j")).collect().foreach { r =>
        val (_, (nn, s, _, ss)) = key(r)
        assert(nn * ss - s * s >= 0L)
      }
  }

  test("merge associativity: partition count does not change the sums") {
    val one = Covariance.sufficientStatsOnePass(emb.repartition(1)).collect().map(key).toMap
    val many = Covariance.sufficientStatsOnePass(emb.repartition(13)).collect().map(key).toMap
    assert(one === many)
  }
}
