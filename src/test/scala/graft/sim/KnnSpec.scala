package graft.sim

import org.scalatest.funsuite.AnyFunSuite

class KnnSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("brute-force top-k: k rows per query, ranks 1..k, descending cosine") {
    val out = Knn.bruteForceTopK(emb, numQueries = 5, k = 5).collect()
    assert(out.length === 25)
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to 5))
      val cosines = sorted.map(_.getDouble(2)).toSeq
      assert(cosines === cosines.sorted.reverse)
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0))) // self excluded
    }
  }

  test("LSH top-k achieves reasonable recall@5 vs brute force") {
    val exact = Knn.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.lshTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 8 tables × 6 planes with 1-bit multiprobe → expected ~0.9 recall
    // even at the ~0.33 cosine these near-orthogonal neighbors have;
    // guards against the bucketing being broken
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("IVF with nprobe = cells equals brute force exactly") {
    val exact = Knn.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Knn.ivfTopK(emb, 5, 5, cells = 8, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(full === exact)
  }

  test("IVF with partial probing returns k ranked rows per query with real similarities") {
    val part = Knn.ivfTopK(emb, 5, 5, cells = 8, nprobe = 2).collect()
    assert(part.length === 25)
    val exact = Knn.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = part.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // structureless corpus: probing 2/8 cells ≈ 25% of the corpus → at
    // least a handful of true neighbors must appear (floor guards the
    // wiring, not the data)
    assert(recall >= 0.1, s"recall@5 = $recall")
  }

  test("LSH candidate set is far smaller than brute force") {
    val n = emb.count()
    val approxRows = Knn.lshTopK(emb, 5, 5).count()
    assert(approxRows <= 25)
    assert(n > 100) // sanity: corpus non-trivial
  }
}
