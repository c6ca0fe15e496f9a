package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def doc(id: Long, nTokens: Int) = {
    import spark.implicits._
    Seq((id, (1 to nTokens).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("7 tokens, window 4, stride 2 -> starts 0,2,4; last runs short") {
    val got = Chunker.overlappingChunks(doc(1, 7), windowTokens = 4,
        stride = 2, withText = true)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "chunk_tokens", "chunk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 2, 4, "t3 t4 t5 t6"),
      (2, 4, 3, "t5 t6 t7")))
  }

  test("short doc (n <= window) yields exactly one whole-doc chunk") {
    val got = Chunker.overlappingChunks(doc(1, 3), windowTokens = 8,
        stride = 8, withText = true).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("chunk") === "t1 t2 t3")
    assert(got(0).getAs[Int]("chunk_tokens") === 3)
  }

  test("every token index is covered by at least one chunk") {
    for (n <- Seq(1, 47, 48, 49, 64, 65, 111, 112, 113, 200)) {
      val spans = Chunker.overlappingChunks(doc(1, n))
        .select("start_tok", "chunk_tokens").collect()
        .map(r => (r.getInt(0), r.getInt(0) + r.getInt(1)))
      val covered = spans.flatMap { case (a, b) => a until b }.toSet
      assert(covered === (0 until n).toSet, s"gap at n=$n")
    }
  }

  test("exact stride boundary produces no empty trailing chunk") {
    // n = window + stride exactly: k = 2, both chunks full-width
    val got = Chunker.overlappingChunks(doc(1, 112)) // 64 + 48
      .orderBy("chunk_idx")
      .select("start_tok", "chunk_tokens").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq === Seq((0, 64), (48, 64)))
  }

  test("explode plan has no shuffle") {
    val plan = Chunker.overlappingChunks(doc(1, 200))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
