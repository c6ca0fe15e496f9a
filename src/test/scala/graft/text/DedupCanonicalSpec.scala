package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DedupCanonicalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("near-identical docs collapse to one canonical per cluster") {
    import spark.implicits._
    // docs 0,1 share all shingles (near-dups); 2 is unrelated; doc 3
    // has <3 words (no shingles -> unclustered, kept).
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", 22L),
      (1L, "alpha beta gamma delta", "en", 22L),
      (2L, "one two three four five", "en", 23L),
      (3L, "tiny doc", "fr", 8L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = DedupClusters.canonicalRetention(docs, 0.5)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      ("en", 3L, 2L, 67L, 45L), // doc 1 dropped (canonical = min id 0)
      ("fr", 1L, 1L, 8L, 8L)))
  }

  test("retention totals agree with the cluster table on the real corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val retention = DedupClusters.canonicalRetention(corpus, 0.5, 12L)
      .agg(sum("n_docs"), sum("kept_docs")).collect()(0)
    val clusters = DedupClusters.fromDocuments(corpus, 0.5, 12L)
    val clustered = clusters.count()
    val canonical = clusters.filter(col("is_canonical")).count()
    assert(retention.getLong(0) === corpus.count())
    // kept = everything minus the non-canonical cluster members
    assert(retention.getLong(1) ===
      corpus.count() - (clustered - canonical))
    assert(canonical < clustered) // the corpus has real near-dup clusters
  }
}
