package graft.sim

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def key(r: Row) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))

  test("PQ with rerank >= corpus equals brute force exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count().toInt
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(key).toSet
    val pq = Pq.pqTopK(emb, numQueries = 5, k = 5, rerank = n)
      .collect().map(key).toSet
    assert(pq === brute)
  }

  test("default ADC + rerank keeps high recall vs brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.pqTopK(emb, numQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }
}
