package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchRollupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private def orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")

  test("union of per-part sketches matches the single-pass sketch within the RSE class") {
    val partials = SketchRollup.partialSketches(orders, "o_orderpriority", "o_custkey")
    val merged = SketchRollup.unionEstimate(partials).head()
    // single pass over the raw data, no partitioning
    val direct = orders.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))))
      .head().getLong(0)
    // merging loses nothing beyond representation noise: both paths
    // estimate the same union; the union gadget may re-estimate from a
    // different target type, so allow a sliver (≪ the 1.6% RSE), not
    // bit-equality
    val delta = math.abs(merged.getLong(0) - direct).toDouble / direct
    assert(delta < 0.01, s"merged ${merged.getLong(0)} vs direct $direct")
    assert(merged.getLong(1) === orders.count())
  }

  test("sketch estimates are within HLL tolerance of exact distinct counts") {
    val partials = SketchRollup.partialSketches(orders, "o_orderpriority", "o_custkey")
    val est = SketchRollup.estimates(partials, "o_orderpriority").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (p, n) =>
      val e = est(p)
      // lgK=12 → relative standard error ~1.6%; allow 4 sigma
      assert(math.abs(e - n).toDouble / n < 0.07, s"$p: est $e vs exact $n")
    }
  }

  test("rollup consumes only stored sketches (no raw-data scan in the plan)") {
    val base = sys.props("java.io.tmpdir") +
      s"/graft-sketch-${ProcessHandle.current().pid()}"
    SketchRollup.partialSketches(orders, "o_orderpriority", "o_custkey")
      .write.mode("overwrite").parquet(base)
    val stored = spark.read.parquet(base)
    val total = SketchRollup.unionEstimate(stored).head().getLong(0)
    // the parquet round-trip changes nothing: stored sketches merge to
    // the same estimate the in-memory partials do
    val inMem = SketchRollup.unionEstimate(
      SketchRollup.partialSketches(orders, "o_orderpriority", "o_custkey"))
      .head().getLong(0)
    assert(total === inMem)
  }
}
