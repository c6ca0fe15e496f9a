package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private def docs = spark.read.parquet(
    "/root/testdata/sf0.001/documents.parquet")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))

  test("prefix filtering is lossless: identical pairs to the full inverted-index join") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val full = Shingles.exactJaccardPairs(docs, t)
        .collect().map(key).toSet
      val pref = Shingles.prefixJaccardPairs(docs, t)
        .collect().map(key).toSet
      assert(pref === full, s"threshold $t")
    }
  }

  test("high threshold prunes candidates versus the full join") {
    // candidate volume proxy: rows entering the verify join. The full
    // join verifies every pair sharing ANY shingle; prefix filtering
    // at t=0.8 verifies only pairs colliding inside the short rarest-
    // shingle prefixes (|s|/5 + 1 of each doc's shingles).
    val sh = Shingles.shingleHashTable(docs)
    val fullCands = sh.select(col("doc_id").as("a"), col("shingle"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), "shingle")
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    val t = 0.8
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1))
    val prefCands = prefix.select(col("doc_id").as("a"), col("shingle"))
      .join(prefix.select(col("doc_id").as("b"), col("shingle")), "shingle")
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    assert(prefCands < fullCands,
      s"prefix candidates $prefCands vs full $fullCands")
  }
}
