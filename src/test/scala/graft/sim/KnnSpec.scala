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

  /** In-JVM brute-force reference: all (a < b) pairs with rounded
    * cosine ≥ threshold, computed with the same kernel arithmetic. */
  private def brutePairs(rows: Array[(Long, Array[Float])],
      threshold: Double): Set[(Long, Long, Double)] = {
    val sorted = rows.sortBy(_._1)
    (for {
      a <- sorted.indices.iterator
      b <- (a + 1) until sorted.length
      c = Knn.roundedDot(sorted(a)._2, sorted(b)._2)
      if c >= threshold
    } yield (sorted(a)._1, sorted(b)._1, c)).toSet
  }

  private def collectVecs(df: org.apache.spark.sql.DataFrame): Array[(Long, Array[Float])] = {
    import spark.implicits._
    df.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
  }

  test("triangle near-dup join equals in-JVM brute force (no driver collect in the plan)") {
    val expected = brutePairs(collectVecs(emb), 0.4)
    val got = Knn.cosineNearDupPairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // every unordered pair exactly once, normalized a < b
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("triangle near-dup join is block-count invariant") {
    val b4 = Knn.cosineNearDupPairs(emb, 0.4, numBlocks = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b32 = Knn.cosineNearDupPairs(emb, 0.4, numBlocks = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(b4 === b32)
  }

  test("blocked near-dup equals brute force on the planted clustered corpus") {
    val aug = Knn.plantedNearDups(emb)
    val expected = brutePairs(collectVecs(aug), 0.95)
    val got = Knn.cosineNearDupBlocked(aug, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    // one planted near-dup per original vector, and nothing else
    assert(expected.size === emb.count())
    assert(expected.forall { case (a, b, _) => b == a + 1000000L })
  }

  test("blocked near-dup candidate generation prunes (subquadratic on clustered data)") {
    val aug = Knn.plantedNearDups(emb)
    val n = aug.count()
    // the rescored candidate set must be far below the n(n-1)/2 pair
    // space — this guards the bucketing actually pruning, not just
    // filtering post-hoc (which the exact path already does)
    val sketches = Knn.cosineNearDupBlocked(aug, -1.0) // keep all rescored candidates
    val candPairs = sketches.count()
    assert(candPairs < n * (n - 1) / 2 / 4,
      s"candidates $candPairs vs pair space ${n * (n - 1) / 2}")
  }

  test("IVF store: partition-pruned probes equal the in-memory IVF exactly") {
    val path = java.nio.file.Files.createTempDirectory("ivf-store").toString
    Knn.buildIvfStore(emb, path, cells = 8)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    val fromStore = Knn.ivfStoreTopK(spark, path, queries, k = 5, nprobe = 2)
    // pruning is real: the cell filter reaches the scan as a PARTITION
    // filter and the selected file set shrinks (inputFiles ignores
    // pruning, so assert on the scan node itself)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val prunedQe = spark.read.parquet(s"$path/vectors")
      .filter(org.apache.spark.sql.functions.col("cell").isin(0, 1))
      .queryExecution
    val scan = prunedQe.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, "cell filter not a partition filter")
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).map(_.files.size).sum
    val allFiles = spark.read.parquet(s"$path/vectors").inputFiles.length
    assert(selected < allFiles, s"pruned $selected vs total $allFiles")
    // same centroids, same probes → store result ≡ in-memory result
    val inMem = Knn.ivfTopK(emb, 5, 5, cells = 8, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val stored = fromStore.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(stored === inMem)
  }

  test("LSH candidate set is far smaller than brute force") {
    val n = emb.count()
    val approxRows = Knn.lshTopK(emb, 5, 5).count()
    assert(approxRows <= 25)
    assert(n > 100) // sanity: corpus non-trivial
  }

  test("hard negatives: cross-label only, ranked like brute with in-class removed") {
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Knn.hardNegatives(emb, numQueries = 5, k = 5).collect()
    assert(out.length === 25)
    out.foreach { r =>
      assert(r.getInt(1) === labels(r.getLong(0)))     // anchor_label faithful
      assert(r.getInt(3) === labels(r.getLong(2)))     // neighbor_label faithful
      assert(r.getInt(1) !== r.getInt(3))              // NEGATIVE: labels differ
    }
    // equivalence: hard negatives == brute-force ranking restricted to
    // cross-label candidates (the mining is a filter, not a new metric)
    val brute = Knn.bruteForceTopK(emb, 5, emb.count().toInt).collect()
    val expected = brute
      .filter(r => labels(r.getLong(1)) != labels(r.getLong(0)))
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (q, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(5)
          .map(r => (q, r.getLong(1), r.getDouble(2)))
      }.toSet
    val got = out.map(r => (r.getLong(0), r.getLong(2), r.getDouble(4))).toSet
    assert(got === expected)
  }
}
