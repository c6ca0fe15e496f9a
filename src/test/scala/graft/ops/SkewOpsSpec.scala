package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("salted aggregation equals direct groupBy on a skewed key") {
    import spark.implicits._
    // 90% of rows share one key — the salting target
    val skewed = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"cold${i % 7}"
      (k, i.toLong, i.toDouble)
    }.toDF("k", "n", "v")
    val direct = skewed.groupBy("k")
      .agg(count(col("n")).as("cnt"), min(col("v")).as("lo"),
        max(col("v")).as("hi"), sum(col("n")).as("total"),
        avg(col("n")).as("mean"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    val salted = SkewOps.saltedAgg(skewed, Seq("k"), buckets = 16,
      Map("cnt" -> ("n", "count"), "lo" -> ("v", "min"),
        "hi" -> ("v", "max"), "total" -> ("n", "sum"), "mean" -> ("n", "avg")))
      .collect().map { r =>
        r.getAs[String]("k") -> (r.getAs[Long]("cnt"), r.getAs[Double]("lo"),
          r.getAs[Double]("hi"), r.getAs[Long]("total"), r.getAs[Double]("mean"))
      }.toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (cnt, lo, hi, total, mean)) =>
      val (dc, dl, dh, dt, dm) = direct(k)
      assert(cnt === dc && lo === dl && hi === dh && total === dt)
      assert(math.abs(mean - dm) < 1e-9)
    }
  }

  test("salted join equals plain join on a skewed fact side") {
    import spark.implicits._
    // 95% of fact rows hit one dim key
    val fact = (1 to 5000).map { i =>
      val k = if (i % 20 != 0) 1L else (i % 7 + 2).toLong
      (i.toLong, k, i * 1.5)
    }.toDF("row_id", "fk", "v")
    val dim = (1L to 10L).map(k => (k, s"name$k")).toDF("pk", "pk_name")
    val plain = fact.join(dim, fact("fk") === dim("pk"))
      .select("row_id", "fk", "v", "pk", "pk_name")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(fact, dim, "fk", "pk", buckets = 8,
        saltOn = Seq("row_id"))
      .select("row_id", "fk", "v", "pk", "pk_name")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 5000) // every fact row matched exactly once
  }

  test("salted join: unmatched fact rows drop, dim replication is invisible") {
    import spark.implicits._
    val fact = Seq((1L, 1L), (2L, 2L), (3L, 99L)).toDF("row_id", "fk")
    val dim = Seq((1L, "a"), (2L, "b"), (4L, "unused")).toDF("pk", "tag")
    val out = SkewOps.saltedJoin(fact, dim, "fk", "pk", buckets = 4,
        saltOn = Seq("row_id"))
      .select("row_id", "tag").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === Set((1L, "a"), (2L, "b")))
    assert(out.length === 2)
  }

  test("approx_count_distinct within rsd tolerance of exact") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx=$a exact=$e")
    }
  }
}
