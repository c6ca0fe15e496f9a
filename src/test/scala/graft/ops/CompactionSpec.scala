package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def mkTree(root: String, ways: Int): Unit =
    (1 to 400).map(i => (i % 3, i % 4, i.toLong, s"v$i"))
      .toDF("year", "round", "k", "v")
      .repartition(ways)
      .write.partitionBy("year", "round").mode("overwrite").parquet(root)

  test("compact collapses a fragmented tree to one sorted file per partition, content-identical") {
    val in = "/tmp/graft_test_compact_in"
    val out = "/tmp/graft_test_compact_out"
    mkTree(in, ways = 8)

    val before = Compaction.audit(spark, in).agg(
      sum("files").as("f"), count(lit(1)).as("p")).head()
    assert(before.getLong(0) > before.getLong(1), "fixture must be fragmented")

    Compaction.compact(spark, in, out, Seq("year", "round"), Seq("k"))

    val after = Compaction.audit(spark, out)
      .agg(sum("files"), count(lit(1)), max("files")).head()
    assert(after.getLong(2) == 1, "one file per partition after compaction")
    assert(after.getLong(1) == 12, "all 3x4 partitions survive")

    val a = spark.read.parquet(in).select("year", "round", "k", "v")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(out).select("year", "round", "k", "v")
      .collect().map(_.toSeq).toSet
    assert(a == b, "content preserved exactly")
  }

  test("filesPerPartition > 1 fans a partition over a bounded salt") {
    val in = "/tmp/graft_test_compact_in2"
    val out = "/tmp/graft_test_compact_out2"
    mkTree(in, ways = 8)
    Compaction.compact(spark, in, out, Seq("year", "round"), Seq("k"),
      filesPerPartition = 2)
    val mx = Compaction.audit(spark, out).agg(max("files")).head().getLong(0)
    assert(mx <= 2, "salted fan-out bounded by filesPerPartition")
    assert(spark.read.parquet(out).count() == 400)
  }

  test("maxRecordsPerFile caps oversize files") {
    val in = "/tmp/graft_test_compact_in3"
    val out = "/tmp/graft_test_compact_out3"
    mkTree(in, ways = 8)
    Compaction.compact(spark, in, out, Seq("year", "round"), Seq("k"),
      maxRecordsPerFile = 10L)
    // 400 rows / 12 partitions = ~34 rows each → ≥ 4 files of ≤10 rows
    val mn = Compaction.audit(spark, out).agg(min("files")).head().getLong(0)
    assert(mn >= 3, "record cap splits files")
    assert(spark.read.parquet(out).count() == 400)
  }
}
