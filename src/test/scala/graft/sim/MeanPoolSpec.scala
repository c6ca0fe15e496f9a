package graft.sim

import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mean-pool gate invariants over the real embeddings table. */
class MeanPoolSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pooled vectors: one row per (label, dim); n_vecs partitions the corpus") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dims = emb.select(size(col("embedding"))).distinct().collect()
    assert(dims.length === 1) // fixed-width embedding column
    val d = dims.head.getInt(0)
    val out = SparkEntry.queries("knn_mean_pool")(spark, sfDir).cache()
    try {
      val labels = emb.select(countDistinct(col("label"))).head.getLong(0)
      assert(out.count() === labels * d)
      // every label's n_vecs is constant across dims and sums to corpus
      val perLabel = out.groupBy("label")
        .agg(countDistinct(col("n_vecs")).as("k"), max(col("n_vecs")).as("n"))
        .collect()
      assert(perLabel.forall(_.getLong(1) === 1L))
      assert(perLabel.map(_.getLong(2)).sum === emb.count())
    } finally { out.unpersist(); () }
  }

  test("pooled mean equals the hand-computed per-dimension average") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 3.0f), 7),
      (2L, Array(3.0f, 5.0f), 7),
      (3L, Array(0.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    // inline twin of the gate expression over the tiny frame
    // (micro-unit quantized means, the gate's currency)
    val pooled = tiny
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("vq", floor(col("v").cast("double") * 1000000.0).cast("long"))
      .groupBy(col("label"), col("dim"))
      .agg(floor(sum(col("vq")).cast("double") / count(lit(1)))
        .cast("long").as("mean_q6"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(pooled((7, 0)) === 2000000L) // mean of [1, 3]
    assert(pooled((7, 1)) === 4000000L) // mean of [3, 5]
    assert(pooled((9, 0)) === 0L)
    assert(pooled((9, 1)) === 1000000L)
  }
}
