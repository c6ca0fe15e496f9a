package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pre-aggregated exact-percentile gate query must equal Spark's
  * builtin `percentile` bit-for-bit (which in turn hash-matches DuckDB
  * quantile_cont in the gate) — guards the cum-range interpolation. */
class PercentileSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pre-aggregated percentiles equal the builtin exact percentile") {
    val got = SparkEntry.queries("a_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val ref = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, v) => assert(v === ref(k), s"group $k") }
  }

  test("approx percentile sketch stays within tolerance of the exact values") {
    val exact = SparkEntry.queries("a_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("a_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (g, es) =>
      es.zip(approx(g)).foreach { case (e, a) =>
        // GK sketch with accuracy 1000 → rank error <= 0.1%; prices
        // span ~1k..100k so value error stays well under 2%
        assert(math.abs(a - e) / e < 0.02, s"group $g: exact $e approx $a")
      }
    }
  }

  test("interpolation handles duplicate values and tiny groups") {
    import spark.implicits._
    // group "a": values with duplicates; group "b": a single row
    val df = (Seq.fill(3)(("a", 1.0)) ++ Seq(("a", 2.0), ("a", 10.0)) ++
      Seq(("b", 5.0))).toDF("l_returnflag", "l_extendedprice")
    df.createOrReplaceTempView("tiny")
    val counts = df.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("c"))
    assert(counts.count() === 4)
    val ref = df.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // run the gate query's logic on the same frame via a temp parquet
    val dir = java.nio.file.Files.createTempDirectory("pct").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("a_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got === ref)
  }
}
