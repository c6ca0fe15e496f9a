package graft.text

import org.scalatest.funsuite.AnyFunSuite

class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def cc(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    DedupClusters.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
      .toSet
  }

  test("two disjoint components with correct canonicals and sizes") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Set(
      (1L, 1L, true, 3L), (2L, 1L, false, 3L), (3L, 1L, false, 3L),
      (10L, 10L, true, 2L), (11L, 10L, false, 2L)))
  }

  test("transitivity beyond one hop: a 10-node path collapses to one cluster") {
    // worst case for label propagation: the min label must walk the
    // whole path (9 hops) — exercises the convergence loop, not just
    // one round
    val path = (1L until 10L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.map(_._2) === Set(1L))
    assert(got.size === 10)
    assert(got.count(_._3) === 1)
    assert(got.forall(_._4 == 10L))
  }

  test("cross-linked components merge (min id wins regardless of edge direction)") {
    val got = cc(Seq((5L, 9L), (2L, 9L), (7L, 8L), (3L, 8L), (3L, 5L)))
    // everything is transitively connected; min id = 2
    assert(got.map(_._2) === Set(2L))
    assert(got.count(_._3) === 1)
    assert(got.forall(_._4 == 6L))
  }

  test("clusters from the document corpus agree with pair connectivity") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Shingles.exactJaccardPairs(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupClusters.fromDocuments(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every paired doc is clustered, pair endpoints share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b))
      assert(clusters(a) <= math.min(a, b))
    }
    // vertex set == docs that appear in at least one pair
    val vertices = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.keySet === vertices)
  }
}
