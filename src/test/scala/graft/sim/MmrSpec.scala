package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** query vec_id 0 plus a planted UNIT-NORM candidate geometry (dot =
    * cosine): ids 1-3 near-clones (rel ≈ .995, pairwise ≈ .9999), ids
    * 4-5 diverse 45°-off candidates (rel ≈ .707, sim-to-clones ≈ .70,
    * sim-to-each-other .5) — with λ = 0.5 a second clone scores
    * .5(.995 − .9999) < 0 while a diverse pick scores .5(.707 − .704)
    * > 0, so MMR must escape the cluster after rank 1. */
  private def planted = {
    def unit(xs: Double*) = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat).toArray
    }
    Seq(
      (0L, unit(1, 0, 0, 0), 0),      // the query
      (1L, unit(1, 0.10, 0, 0), 0),   // clone cluster
      (2L, unit(1, 0.11, 0, 0), 0),
      (3L, unit(1, 0.09, 0, 0), 0),
      (4L, unit(1, 0, 1, 0), 0),      // diverse in distinct tail dims
      (5L, unit(1, 0, 0, 1), 0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("MMR interleaves diverse results where pure top-k returns the clone cluster") {
    val topk = Knn.bruteForceTopK(planted, numQueries = 1, k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(topk === Set(1L, 2L, 3L)) // relevance alone keeps the clones
    val mmr = Mmr.mmrTopK(planted, numQueries = 1, poolSize = 5, k = 3,
        lambda = 0.5)
      .orderBy(col("mmr_rank")).collect().map(_.getLong(1))
    assert(mmr.head === 3L) // rank 1 = most relevant (smallest tail angle)
    // ranks 2-3 must escape the clone cluster
    assert(mmr.tail.toSet === Set(4L, 5L),
      s"MMR failed to diversify: picked ${mmr.toSeq}")
  }

  test("lambda = 1 reduces to relevance ranking") {
    val rel = Knn.bruteForceTopK(planted, numQueries = 1, k = 5)
      .orderBy(col("rnk")).collect().map(_.getLong(1)).toSeq
    val mmr = Mmr.mmrTopK(planted, numQueries = 1, poolSize = 6, k = 5,
        lambda = 1.0)
      .orderBy(col("mmr_rank")).collect().map(_.getLong(1)).toSeq
    assert(mmr === rel)
  }

  test("selected sets are disjoint and ranks dense per query on the real corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Mmr.mmrTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).distinct.length === rows.length, s"query $q repeats a doc")
      assert(rows.map(_._3).sorted.toSeq === (1 to 5).toSeq, s"query $q ranks not dense")
    }
  }
}
