package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmeansStepSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("hand case: two clear clusters, means and counts exact") {
    // seeds = vec 1 (near origin) and vec 2 (near (10,10));
    // vec 3 joins cluster 1, vec 4 joins cluster 2
    val df = emb(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 10f)),
      (3L, Seq(1f, 0f)), (4L, Seq(9f, 10f)))
    val got = KmeansStep.step(df, k = 2)
      .orderBy("cluster_id", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // quantized: 0->0, 1->1024, 9->9216, 10->10240
    assert(got.toSeq === Seq(
      (1L, 0, 2L, 512.0), (1L, 1, 2L, 0.0),
      (2L, 0, 2L, 9728.0), (2L, 1, 2L, 10240.0)))
  }

  test("distance ties assign to the lower centroid id") {
    // vec 3 equidistant from both seeds
    val df = emb((1L, Seq(0f)), (2L, Seq(2f)), (3L, Seq(1f)))
    val got = KmeansStep.step(df, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L)) // vec3 joins cluster 1
  }

  test("every vector lands in exactly one cluster") {
    val df = emb((1 to 20).map(i =>
      (i.toLong, Seq(i.toFloat, (i * 3 % 7).toFloat))): _*)
    val total = KmeansStep.step(df, k = 4)
      .where(col("dim") === 0)
      .agg(sum("n_members")).collect()(0).getLong(0)
    assert(total === 20L)
  }
}
