package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import CountMinAgg._

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val (w, d) = (256, 4)

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(countMin(w, d)(col("item"))).collect()(0)
      .getSeq[Long](0).toArray

  test("one-sided CMS bound: never undercounts, overshoot <= e/width * n") {
    import spark.implicits._
    // zipf-ish: item k appears 1000/k times
    val rows = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"item$k"))
    val df = rows.toDF("item")
    val sk = sketchOf(df)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val bound = math.ceil(math.E / w * n).toLong
    exact.foreach { case (k, c) =>
      val est = estimate(sk, w, d, k)
      assert(est >= c, s"undercount for $k")
      assert(est <= c + bound, s"overshoot for $k: $est vs $c + $bound")
    }
    // an absent key estimates at most the collision bound
    assert(estimate(sk, w, d, "never-seen") <= bound)
  }

  test("sketch is invariant to partitioning (merge associativity)") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => s"k${i % 37}")
    val a = sketchOf(rows.toDF("item"))
    val b = sketchOf(rows.toDF("item").repartition(13))
    val c = sketchOf(rows.toDF("item").repartition(1))
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq === c.toSeq)
  }

  test("executor-side probe (xxh64_seeded + element_at) equals driver estimate") {
    import spark.implicits._
    XxHash64Seeded.register(spark)
    val rows = (1 to 2000).map(i => s"k${i % 37}")
    val df = rows.toDF("item")
    val sk = df.agg(countMin(w, d)(col("item")).as("sk"))
    val probes = (0 until d).map { r =>
      element_at(col("sk"),
        (expr(s"pmod(xxh64_seeded(item, ${r}L), $w)") + lit(r * w) + lit(1))
          .cast("int"))
    }
    val got = df.distinct().crossJoin(broadcast(sk))
      .select(col("item"), least(probes: _*).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val skArr = sketchOf(df)
    got.foreach { case (k, est) =>
      assert(est === estimate(skArr, w, d, k), s"probe mismatch for $k")
    }
  }

  test("md5 twin: SQL-side probe expression equals the JVM slot function") {
    import spark.implicits._
    // the gate's probe column must address the same cell the aggregator
    // incremented — i.e. Spark's conv(substring(md5("d:key"),1,15),16,10)
    // mod w must equal CountMinAgg.md5Slot for every key.
    val keys = (1 to 300).map(i => s"src-$i ümläut")
    val got = keys.toDF("item").select(col("item"),
      array((0 until d).map { r =>
        pmod(conv(substring(md5(
          concat(lit(r).cast("string"), lit(":"), col("item"))), 1, 15),
          16, 10).cast("long"), lit(w.toLong)).cast("int")
      }: _*).as("slots"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    keys.foreach { k =>
      val exp = (0 until d).map(r => CountMinAgg.md5Slot(r, k, w))
      assert(got(k) === exp, s"slot mismatch for $k")
    }
  }

  test("md5 twin sketch: cell load equals sum of colliding exact counts") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => s"k${i % 61}")
    val sk = rows.toDF("item").agg(countMinMd5(w, d)(col("item")))
      .collect()(0).getSeq[Long](0).toArray
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (depth <- 0 until d; s <- 0 until w) {
      val expected = exact.collect {
        case (k, c) if md5Slot(depth, k, w) == s => c
      }.sum
      assert(sk(depth * w + s) === expected)
    }
  }

  test("total mass per depth row equals n") {
    import spark.implicits._
    val rows = (1 to 500).map(i => s"x$i")
    val sk = sketchOf(rows.toDF("item"))
    for (depth <- 0 until d) {
      val rowSum = sk.slice(depth * w, (depth + 1) * w).sum
      assert(rowSum === 500L)
    }
  }
}
