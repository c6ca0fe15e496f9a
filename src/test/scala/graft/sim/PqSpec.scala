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

  test("IVF x PQ with probes=all and rerank >= corpus equals brute force exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count().toInt
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(key).toSet
    // nprobe = cells → every cell scanned → ADC sees every code →
    // with rerank ≥ corpus the exact rescore IS brute force; this also
    // pins ivfPqTopK ≡ flat pqTopK at the same degenerate settings.
    val ivfpq = Pq.ivfPqTopK(emb, numQueries = 5, k = 5,
      cells = 16, nprobe = 16, rerank = n)
      .collect().map(key).toSet
    assert(ivfpq === brute)
    val flat = Pq.pqTopK(emb, numQueries = 5, k = 5, rerank = n)
      .collect().map(key).toSet
    assert(ivfpq === flat)
  }

  test("IVF x PQ default routing keeps a recall floor vs brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Pq.ivfPqTopK(emb, numQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivfpq).size.toDouble / brute.size
    // unstructured synthetic corpus: cell routing is data-limited (the
    // same caveat as IVF alone) — the floor documents it stays useful
    assert(recall >= 0.5, s"recall $recall")
  }

  test("PCA x PQ with rerank >= corpus equals brute force exactly") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count().toInt
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(key).toSet
    // rerank ≥ corpus → the original-space rescore IS brute force
    val pq = Pq.pcaPqTopK(emb, numQueries = 5, k = 5, rerank = n)
      .collect().map(key).toSet
    assert(pq === brute)
  }

  test("PCA x PQ default settings keep a recall floor vs brute force") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.pcaPqTopK(emb, numQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVFPQ store: pruned probe ≡ in-memory IVFADC, degenerate ≡ brute") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count().toInt
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Pq.buildIvfPqStore(emb, path, cells = 8)
    // degenerate settings: all cells probed + rerank ≥ corpus ≡ brute
    val brute = Knn.bruteForceTopK(emb, numQueries = 5, k = 5)
      .collect().map(key).toSet
    val full = Pq.ivfPqStoreTopK(spark, path, emb, numQueries = 5, k = 5,
      nprobe = 8, rerank = n).collect().map(key).toSet
    assert(full === brute)
    // default routing keeps the recall floor
    val probed = Pq.ivfPqStoreTopK(spark, path, emb, numQueries = 5, k = 5,
      nprobe = 2)
    val recall = brute.map(t => (t._1, t._2))
      .intersect(probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
    // and the ADC scan is PARTITION-pruned: the probed-cell filter must
    // reach the file index as a partition filter, not a post-scan filter
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
      plan.matches("(?s).*PartitionFilters: \\[.*cell.*IN.*"),
      s"expected partition pruning on cell in:\n$plan")
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
