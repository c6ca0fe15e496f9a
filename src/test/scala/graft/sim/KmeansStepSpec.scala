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

class KmeansTrainSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("one iteration matches step's floor-quantized means") {
    val df = emb(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 10f)),
      (3L, Seq(1f, 0f)), (4L, Seq(9f, 10f)))
    val viaStep = KmeansStep.step(df, k = 2)
      .select(col("cluster_id"), col("dim"),
        floor(col("mean_q")).cast("long").as("cq"))
      .orderBy("cluster_id", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaTrain = KmeansStep.train(df, k = 2, iters = 1)
      .select(col("cluster_id"), col("dim"), col("cq"))
      .orderBy("cluster_id", "dim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaTrain.toSeq === viaStep.toSeq)
  }

  test("converged corpus is a fixed point: iters 2 == iters 5") {
    // two tight, well-separated blobs; after one update the centroids
    // sit at the blob floors and never move again
    val df = emb(
      (1L, Seq(0f, 0f)), (2L, Seq(100f, 100f)),
      (3L, Seq(1f, 1f)), (4L, Seq(101f, 101f)),
      (5L, Seq(0f, 1f)), (6L, Seq(100f, 101f)))
    def result(iters: Int) =
      KmeansStep.train(df, k = 2, iters = iters)
        .orderBy("cluster_id", "dim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
    assert(result(2) === result(5))
  }

  test("membership counts cover the corpus exactly once") {
    val df = emb((1 to 30).map(i =>
      (i.toLong, Seq(i.toFloat, (i * 7 % 11).toFloat))): _*)
    val perCluster = KmeansStep.train(df, k = 4, iters = 3)
      .select("cluster_id", "n_members").distinct()
      .collect().map(_.getLong(1))
    assert(perCluster.sum === 30L)
  }
}
