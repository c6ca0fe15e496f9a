package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Expectations._

class StreamMetricsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val rules = Seq(InRange("v", 0, 100), InSet("flag", Seq("A", "B")))

  test("observe counts rows and violations per micro-batch without a second pass") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Double, String)]
    val observed = StreamMetrics.observeQuality(
      input.toDF().toDF("id", "v", "flag"), "quality", rules)
    val listener = StreamMetrics.listen(spark, "quality")
    val out = Files.createTempDirectory("graft_sm_").toString
    val q = observed.writeStream
      .format("noop")
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    try {
      input.addData(Seq((1L, 5.0, "A"), (2L, 500.0, "A"), (3L, 7.0, "Z")))
      q.processAllAvailable()
      // null in_set value counts as a violation (not a silent non-count)
      input.addData(Seq((4L, 8.0, "B"), (5L, 9.0, null)))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
    val r = listener.readings.filter(_.rows > 0)
    assert(r.map(_.rows).sum == 5)
    assert(r.map(_.violations).sum == 3)
    assert(listener.violationRate.contains(0.6))
  }
}
