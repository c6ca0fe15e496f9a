package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class CusumSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case matches the sequential recurrence") {
    import spark.implicits._
    // target 10, slack 0, h 5; deltas: +5, -8 (clips at 0), +3, +4
    // S: 5, 0, 3, 7(alert)
    val df = Seq(("k", 1L, 1L, 15.0), ("k", 2L, 2L, 2.0),
      ("k", 3L, 3L, 13.0), ("k", 4L, 4L, 14.0))
      .toDF("key", "t", "id", "v")
    val out = Cusum.detect(df, "key", "t", "id", "v", 10.0, 0.0, 5.0)
      .orderBy("t").collect()
      .map(r => (r.getDouble(4), r.getBoolean(5)))
    assert(out.toSeq === Seq((5.0, false), (0.0, false), (3.0, false),
      (7.0, true)))
  }

  test("randomized parity vs a per-key sequential fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1 to 2000).map(i => ("k" + rnd.nextInt(5),
      rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(2000) / 100.0))
    val (target, slack, h) = (9.5, 0.5, 20.0)
    val got = Cusum.detect(rows.toDF("key", "t", "id", "v").repartition(7),
        "key", "t", "id", "v", target, slack, h)
      .collect().map(r => r.getLong(2) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    rows.groupBy(_._1).values.foreach { ks =>
      var s = BigDecimal(0)
      ks.sortBy(r => (r._2, r._3)).foreach { case (_, _, id, v) =>
        val delta = BigDecimal(v - target - slack)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        s = (s + delta).max(BigDecimal(0))
        assert(got(id)._1 === s.toDouble, s"row $id")
        assert(got(id)._2 === (s > BigDecimal(h)), s"row $id alert")
      }
    }
  }

  test("alert clears after the metric returns to target") {
    import spark.implicits._
    val vals = Seq.fill(5)(20.0) ++ Seq.fill(30)(0.0) // burst then quiet
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", i.toLong, i.toLong, v) }.toDF("key", "t", "id", "v")
    val out = Cusum.detect(df, "key", "t", "id", "v", 10.0, 0.0, 30.0)
      .orderBy("t").collect().map(_.getBoolean(5))
    assert(out.slice(3, 5).forall(identity))  // alert during the burst
    assert(!out.last)                         // recovered
  }
}
