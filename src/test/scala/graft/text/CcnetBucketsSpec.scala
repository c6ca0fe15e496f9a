package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CcnetBucketsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("terciles partition the scored corpus with sizes differing by <= 1") {
    val out = CcnetBuckets.buckets(corpus).collect()
    val byBucket = out.groupBy(_.getInt(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byBucket.keySet === Set(1, 2, 3))
    val sizes = byBucket.values.toSeq
    assert(sizes.max - sizes.min <= 1, s"bucket sizes $byBucket")
    // every doc with >= 2 words is scored and bucketed exactly once
    val scoreable = corpus
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(sizes.sum === scoreable)
  }

  test("bucket 1 (head) dominates bucket 2 dominates bucket 3 by score") {
    val out = CcnetBuckets.buckets(corpus).collect()
      .map(r => (r.getInt(1), r.getDouble(4), r.getDouble(5))) // bucket, min, max
    def minOf(b: Int) = out.filter(_._1 == b).map(_._2).min
    def maxOf(b: Int) = out.filter(_._1 == b).map(_._3).max
    assert(minOf(1) >= maxOf(2))
    assert(minOf(2) >= maxOf(3))
  }

  test("bucketing is repartitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      CcnetBuckets.buckets(df).orderBy("lang", "bucket").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq
    assert(run(corpus) === run(corpus.repartition(9)))
  }
}
