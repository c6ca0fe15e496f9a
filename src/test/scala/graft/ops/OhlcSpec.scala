package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OhlcSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("open/high/low/close per bucket with tie-broken endpoints") {
    import spark.implicits._
    // key A, bucket [0,100): ts 10→5.0, 20→9.0, 30→1.0, 40→7.0
    // key A, bucket [100,200): single sample
    // key B, bucket [0,100): two samples at the SAME ts — tie on id
    val df = Seq(
      ("A", 10L, 1L, 5.0), ("A", 20L, 2L, 9.0),
      ("A", 30L, 3L, 1.0), ("A", 40L, 4L, 7.0),
      ("A", 150L, 5L, 3.5),
      ("B", 60L, 6L, 2.0), ("B", 60L, 7L, 8.0)
    ).toDF("k", "ts", "id", "v")
    val out = Ohlc.resample(df, Seq("k"), "ts", "id", "v", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(out(("A", 0L)) === ((5.0, 9.0, 1.0, 7.0, 4L)))
    assert(out(("A", 100L)) === ((3.5, 3.5, 3.5, 3.5, 1L)))
    // same ts: id 6 opens, id 7 closes
    assert(out(("B", 0L)) === ((2.0, 8.0, 2.0, 8.0, 2L)))
    assert(out.size === 3)
  }

  test("bucket floor is integer-exact at epoch-micros magnitudes") {
    import spark.implicits._
    val w = 3600000000L // 1h in micros
    val base = 1700000000000000L // realistic epoch micros
    // one sample just below and one at a bucket boundary
    val b0 = base - (base % w)
    val df = Seq(("k", b0 + w - 1L, 1L, 1.0), ("k", b0 + w, 2L, 2.0))
      .toDF("k", "ts", "id", "v")
    val buckets = Ohlc.resample(df, Seq("k"), "ts", "id", "v", w)
      .select("bucket_start").as[Long].collect().sorted
    assert(buckets === Array(b0, b0 + w))
  }

  test("randomized parity vs the declarative window form") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (1 to 3000).map(i =>
        ("k" + rnd.nextInt(5), rnd.nextInt(500).toLong, i.toLong,
          rnd.nextInt(10000) / 100.0))
      .toDF("k", "ts", "id", "v").repartition(7)
    val got = Ohlc.resample(df, Seq("k"), "ts", "id", "v", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    // reference: two row_number windows + group aggregate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("b"))
    val ref = df.withColumn("b", col("ts") - pmod(col("ts"), lit(100L)))
      .withColumn("rna", row_number().over(w.orderBy(col("ts"), col("id"))))
      .withColumn("rnd_", row_number().over(
        w.orderBy(col("ts").desc, col("id").desc)))
      .groupBy(col("k"), col("b"))
      .agg(max(when(col("rna") === 1, col("v"))).as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        max(when(col("rnd_") === 1, col("v"))).as("close"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(got === ref)
  }

  test("single shuffle: no window exchange beyond the groupBy") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("k" + i % 3, i.toLong, i.toLong, i * 0.5))
      .toDF("k", "ts", "id", "v")
    val plan = Ohlc.resample(df, Seq("k"), "ts", "id", "v", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }
}
