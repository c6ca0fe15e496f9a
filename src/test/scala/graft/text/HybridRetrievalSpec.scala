package graft.text

import org.scalatest.funsuite.AnyFunSuite

class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("RRF fuses both rankings: dual-list docs beat equal-rank single-list docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val fused = HybridRetrieval.rrfTopDocs(docs, emb,
      Seq("hash", "join", "scan"), depth = 50, topK = 50).collect()
    assert(fused.nonEmpty)
    // fused scores descend with the declared tiebreak
    val scores = fused.map(_.getAs[Double]("rrf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every doc carries at least one real rank, and the RRF identity
    // holds row by row
    fused.foreach { r =>
      val lex = r.getAs[Int]("lex_rank"); val vec = r.getAs[Int]("vec_rank")
      assert(lex > 0 || vec > 0)
      val expected = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (vec > 0) 1.0 / (60 + vec) else 0.0)
      assert(r.getAs[Double]("rrf") === expected)
    }
    // any doc in BOTH lists strictly outranks any doc whose single
    // rank is no better than the dual doc's worse rank (RRF dominance)
    val dual = fused.filter(r => r.getAs[Int]("lex_rank") > 0 &&
      r.getAs[Int]("vec_rank") > 0)
    val single = fused.filter(r => r.getAs[Int]("lex_rank") < 0 ||
      r.getAs[Int]("vec_rank") < 0)
    for (d <- dual; s <- single) {
      val dWorse = math.max(d.getAs[Int]("lex_rank"), d.getAs[Int]("vec_rank"))
      val sRank = math.max(s.getAs[Int]("lex_rank"), s.getAs[Int]("vec_rank"))
      if (sRank >= dWorse)
        assert(d.getAs[Double]("rrf") > s.getAs[Double]("rrf"))
    }
  }
}
