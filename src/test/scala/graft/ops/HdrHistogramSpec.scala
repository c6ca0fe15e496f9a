package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HdrHistogramSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val K = 5

  private def cents = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(col("l_returnflag"),
      expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("x"))

  test("Spark bucket expression matches the Scala reference on an adversarial sweep") {
    import spark.implicits._
    // powers of two, their neighbours, and the exact region boundary
    val pos = (0L to 130L) ++
      (7 to 62).flatMap(b => Seq((1L << b) - 1, 1L << b, (1L << b) + 1)) ++
      Seq(12345L, 999999L, 123456789012L)
    val xs = pos ++ pos.filter(_ > 0).map(-_) // signed domain (r13)
    import spark.implicits._
    // per-x buckets through the production Spark expression
    val viaSpark = HdrHistogram.histogram(
      xs.toDF("x").withColumn("g", concat(lit("x"), col("x"))),
      "g", "x", K).collect()
      .map(r => r.getString(0).drop(1).toLong -> r.getLong(1)).toMap
    xs.foreach { x =>
      val lo = HdrHistogram.bucketLoRef(x, K)
      assert(viaSpark(x) === lo, s"spark bucket of $x")
      if (x >= 0) {
        // bucket invariants: lo ≤ x ≤ lo + lo/2^k + 1, exact under 2^(k+1)
        assert(lo <= x && x <= lo + (lo >> K) + 1, s"x=$x lo=$lo")
        if (x < (1L << (K + 1))) assert(lo === x)
      } else {
        // mirror map: bucket(x) = −bucket(−x), an UPPER bound within
        // the same relative band, still monotone in x
        assert(lo === -HdrHistogram.bucketLoRef(-x, K))
        assert(lo >= x && x >= lo - ((-lo) >> K) - 1, s"x=$x lo=$lo")
      }
    }
  }

  test("negative-heavy data keeps the bounded-bucket contract on both engines") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    // 3000 distinct signed values spanning ±9e6 — pre-r13 each negative
    // landed in its own exact singleton bucket (unbounded store growth
    // on negative-heavy data, r12 verdict item 5)
    val xs = (1L to 3000L).map(i => if (i % 2 == 0) i * i else -(i * i))
    val hist = HdrHistogram.histogram(xs.toDF("x").withColumn("g", lit("all")),
      "g", "x", K).collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // O(2^k · log range) buckets, far below the distinct-value count
    assert(hist.size < 1400, s"bucket count ${hist.size} not collapsed")
    assert(hist.values.sum === 3000L)
    assert(hist.size < xs.distinct.size / 2)
    // engine parity: the DuckDB spelling buckets the same generated
    // values to the same (lo, cnt) histogram
    val duckHist = DuckBridgeTestUtil.duck(
      s"""SELECT lo, COUNT(*) AS cnt FROM (
         |  SELECT ${HdrHistogram.bucketLoSql("x", K)} AS lo FROM (
         |    SELECT CASE WHEN i % 2 = 0 THEN (i * i)::BIGINT
         |                ELSE -((i * i)::BIGINT) END AS x
         |    FROM range(1, 3001) t(i)) s) b GROUP BY 1""".stripMargin)
      .map(r => r(0).get.toLong -> r(1).get.toLong).toMap
    assert(duckHist === hist)
  }

  test("quantile lower bounds sit within 2^-k of the exact type-1 quantiles") {
    val out = HdrHistogram.quantiles(cents, "l_returnflag", "x", K,
      Seq(500, 900, 990)).collect()
      .map(r => r.getString(0) -> (r.getLong(2 + 1), r.getLong(2 + 2), r.getLong(2 + 3)))
      .toMap
    val byFlag = cents.collect().groupBy(_.getString(0))
      .map { case (f, rows) => f -> rows.map(_.getLong(1)).sorted }
    byFlag.foreach { case (f, sorted) =>
      val n = sorted.length
      def exactQ(q: Int): Long = sorted(((n.toLong * q + 999) / 1000).toInt - 1)
      val (p50, p90, p99) = out(f)
      Seq(p50 -> exactQ(500), p90 -> exactQ(900), p99 -> exactQ(990)).foreach {
        case (lo, ex) =>
          assert(lo <= ex, s"$f: lo $lo above exact $ex")
          assert(lo >= ex - (ex >> K) - 1, s"$f: lo $lo more than 2^-$K below $ex")
      }
    }
  }

  test("rolling-window quantiles equal the definitional trailing-window reference") {
    val ev = graft.queries.QueryDsl.events(spark, "/root/testdata/sf0.001")
      .select(expr("ev_us div 86400000000").as("day"),
        expr("CAST(FLOOR(value * 1000000.0) AS BIGINT)").as("x"))
    val got = HdrHistogram.rollingQuantiles(ev, "day", "x", K, 7, Seq(500, 990))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val raw = ev.collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = raw.map(_._1).distinct
    assert(got.keySet === days.toSet)
    days.foreach { d =>
      val window = raw.collect { case (dd, x) if dd >= d - 6 && dd <= d => x }
      val (nRows, nBuckets, p50, p99) = got(d)
      assert(nRows === window.length.toLong, s"day $d n_rows")
      // merged-histogram support == direct histogram of the window's raw rows
      assert(nBuckets === window.map(HdrHistogram.bucketLoRef(_, K)).distinct.length.toLong,
        s"day $d n_buckets")
      val sorted = window.sorted
      def exactQ(q: Int): Long =
        sorted(((window.length.toLong * q + 999) / 1000).toInt - 1)
      Seq(p50 -> exactQ(500), p99 -> exactQ(990)).foreach { case (lo, ex) =>
        assert(lo <= ex && lo >= ex - (ex >> K) - 1, s"day $d: $lo vs $ex")
      }
    }
  }

  test("shard histograms merge by count addition, bit-identically to a rebuild") {
    def histMap(df: org.apache.spark.sql.DataFrame) =
      HdrHistogram.histogram(df, "l_returnflag", "x", K).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = histMap(cents)
    val h1 = histMap(cents.filter(col("x") % 2 === 0))
    val h2 = histMap(cents.filter(col("x") % 2 =!= 0))
    val merged = (h1.keySet ++ h2.keySet).map { k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))
    }.toMap
    assert(merged === direct)
  }
}
