package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("column morton equals the reference bit-interleave for exhaustive small inputs") {
    import spark.implicits._
    val bits = 6
    val pairs = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.morton(col("x"), col("y"), bits).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === ZOrder.mortonRef(x, y, bits),
        s"mismatch at ($x,$y)")
    }
    // bijectivity over the full bits×bits grid (no collisions = the
    // interleave really is a space-filling curve, not a lossy hash)
    assert(got.values.toSet.size === pairs.size)
  }

  test("z-layout write: files cover disjoint z-ranges (the pruning enabler)") {
    import spark.implicits._
    val bits = 8
    val rows = (0 until 20000)
      .map(i => (i.toLong * 7919 % 256, i.toLong * 104729 % 256, i.toLong))
    val df = rows.toDF("x", "y", "payload")
    val out = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.layoutByZ(df, "x", "y", bits, partitions = 8, out)

    val back = spark.read.parquet(out)
    assert(back.count() === 20000L)
    // recompute z per row, check per-file [min,max] spans are disjoint
    val spans = back
      .withColumn("_z", ZOrder.morton(col("x"), col("y"), bits))
      .withColumn("_f", input_file_name())
      .groupBy(col("_f"))
      .agg(min(col("_z")).as("lo"), max(col("_z")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length > 1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file z-ranges: $hi1 > $lo2")
      case _ => ()
    }
  }
}
