package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Expectations._

class ValidatedIngestSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val rules = Seq(
    NotNull("v", 1.0),
    InRange("v", 0, 100),
    InSet("flag", Seq("A", "B")))

  private def tmp() = Files.createTempDirectory("graft_vi_").toString

  test("writeBatch routes rows and tags the first violated rule") {
    val batch = Seq(
      (1L, Some(10.0), "A"),   // good
      (2L, None, "A"),         // not_null fails (first in order)
      (3L, Some(500.0), "B"),  // in_range fails
      (4L, Some(20.0), "Z"),   // in_set fails
      (5L, Some(30.0), null))  // NULL in_set column must quarantine, not vanish
      .toDF("id", "v", "flag")
    val good = tmp(); val bad = tmp()
    val (ng, nb) = ValidatedIngest.writeBatch(batch, rules, good, bad, 0L)
    assert(ng == 1 && nb == 4)
    val q = spark.read.parquet(s"$bad/batch=0")
      .select("id", "_violation").as[(Long, String)].collect().toMap
    assert(q(2L) == "not_null(v)")
    assert(q(3L) == "in_range(v,0.0,100.0)")
    assert(q(4L) == "in_set(flag)")
    assert(q(5L) == "in_set(flag)")
    assert(spark.read.parquet(s"$good/batch=0").count() == 1)
  }

  test("crash-replay of a batch is idempotent (overwrite, not append)") {
    val batch = Seq((1L, Some(1.0), "A"), (2L, Some(-5.0), "B"))
      .toDF("id", "v", "flag")
    val good = tmp(); val bad = tmp()
    ValidatedIngest.writeBatch(batch, rules, good, bad, 7L)
    ValidatedIngest.writeBatch(batch, rules, good, bad, 7L) // replay
    assert(spark.read.parquet(s"$good/batch=7").count() == 1)
    assert(spark.read.parquet(s"$bad/batch=7").count() == 1)
  }

  test("streaming E2E: batches land partitioned by id; published tree reads whole") {
    val good = tmp(); val bad = tmp(); val ckpt = tmp()
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Double, String)]
    val stream = input.toDF().toDF("id", "v", "flag")
    val q = ValidatedIngest.start(stream, rules, good, bad, ckpt)
    try {
      input.addData(Seq((1L, 5.0, "A"), (2L, 200.0, "A")))
      q.processAllAvailable()
      input.addData(Seq((3L, 7.0, "B"), (4L, 8.0, "Q")))
      q.processAllAvailable()
    } finally q.stop()
    val pub = ValidatedIngest.readPublished(spark, good)
    assert(pub.select("id").as[Long].collect().toSet == Set(1L, 3L))
    val quar = spark.read.option("basePath", bad).parquet(bad)
    assert(quar.select("id").as[Long].collect().toSet == Set(2L, 4L))
    // batch provenance survives as the partition column
    assert(pub.select(col("batch").cast("long")).as[Long]
      .collect().toSet == Set(0L, 1L))
  }
}
