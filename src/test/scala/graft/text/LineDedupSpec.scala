package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame, w: Int) =
    LineDedup.dedupChunks(df, w).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("duplicate chunk survives only at its first (doc, idx) occurrence") {
    // W=2: doc0 = [a b][c d], doc1 = [c d][e f] — "c d" repeats.
    val got = run(docs("a b c d", "c d e f"), 2)
    assert(got.toSeq === Seq(
      (0L, 2L, 2L, "a b c d"),
      (1L, 2L, 1L, "e f")))
  }

  test("within-doc repeat keeps the earlier chunk index") {
    // doc0 = [x y][x y] — second occurrence dropped.
    val got = run(docs("x y x y"), 2)
    assert(got.toSeq === Seq((0L, 2L, 1L, "x y")))
  }

  test("partial trailing chunk is its own unit") {
    // W=3: doc0 = [a b c][d] — the 1-word tail chunk "d" is distinct
    // from doc1's full chunk [d e f].
    val got = run(docs("a b c d", "d e f"), 3)
    assert(got.toSeq === Seq(
      (0L, 2L, 2L, "a b c d"),
      (1L, 1L, 1L, "d e f")))
  }

  test("a doc that is entirely later-duplicates rebuilds to empty text") {
    val got = run(docs("p q", "p q"), 2)
    assert(got.toSeq === Seq(
      (0L, 1L, 1L, "p q"),
      (1L, 1L, 0L, "")))
  }

  test("rebuild preserves chunk order and is repartitioning-invariant") {
    val d = docs("a b c d e f g h", "c d q r")
    val base = run(d, 2).toSeq
    val shuffled = run(d.repartition(7), 2).toSeq
    assert(base === shuffled)
    assert(base.head._4 === "a b c d e f g h")
  }

  test("docs with 1000+ chunks dedup correctly (struct keeper, no key encoding)") {
    // Regression: the old doc_id*1000+ci encoding collided (0, ci=1000)
    // with (1, ci=0), marking BOTH occurrences of a shared chunk as
    // kept. doc0 has 1001 one-word chunks ending in "z"; doc1 starts
    // with "z" — only doc0's instance may survive.
    val long0 = (0 until 1000).map(i => s"w$i").mkString(" ") + " z"
    val got = run(docs(long0, "z tail"), 1)
    assert(got.map(g => (g._1, g._2, g._3)).toSeq === Seq((0L, 1001L, 1001L), (1L, 2L, 1L)))
    assert(got(1)._4 === "tail")
  }

  test("kept-chunk totals are consistent on the real corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = LineDedup.dedupChunks(corpus, 8)
    val row = out.agg(
      sum("n_chunks").as("c"), sum("n_kept").as("k"),
      sum(when(col("n_kept") < col("n_chunks"), 1L).otherwise(0L)).as("touched"))
      .collect()(0)
    val (c, k, touched) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(out.count() === corpus.count()) // every doc present
    assert(k < c)                          // something deduped
    assert(touched > 0)
    // keeper rule keeps EXACTLY one instance per distinct chunk text:
    // independent recomputation of the distinct-chunk count
    val distinctChunks = corpus
      .select(explode(expr(
        """transform(sequence(0, (size(split(text, ' ')) + 7) div 8 - 1),
          |  i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))"""
          .stripMargin)).as("chunk"))
      .agg(countDistinct(col("chunk"))).collect()(0).getLong(0)
    assert(distinctChunks === k)
  }
}
