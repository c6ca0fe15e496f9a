package graft.sim

import org.scalatest.funsuite.AnyFunSuite

class ItemSimSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case: cosine, symmetry, and the basket cap") {
    import spark.implicits._
    // baskets: b1={A,B}, b2={A,B}, b3={A,C}, b4={A,B,C,D} (dropped,
    // cap 3). After cap: n_A=3, n_B=2, n_C=1; AB=2, AC=1.
    val df = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"),
      (4L, "A"), (4L, "B"), (4L, "C"), (4L, "D"))
      .toDF("bk", "it")
    val out = ItemSim.topkCosine(df, "bk", "it", k = 5, maxBasket = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")))
    assert(out(("A", "B"))._1 === 2L)
    assert(out(("A", "B"))._2 === 2.0 / math.sqrt(3.0 * 2.0))
    assert(out(("A", "C"))._2 === 1.0 / math.sqrt(3.0 * 1.0))
    assert(out(("A", "B")) === out(("B", "A"))) // symmetric scores
    // D co-occurred only in the dropped basket → absent entirely
    assert(!out.keySet.exists(p => p._1 == "D" || p._2 == "D"))
  }

  test("top-k truncates per item with deterministic tiebreak") {
    import spark.implicits._
    // item X pairs once with each of 5 partners (all cosine-equal by
    // construction: every partner appears in exactly one basket)
    val df = (1 to 5).flatMap(i => Seq((i.toLong, "X"), (i.toLong, "P" + i)))
      .toDF("bk", "it")
    val forX = ItemSim.topkCosine(df, "bk", "it", k = 3, maxBasket = 10)
      .filter("item = 'X'").orderBy("rank")
      .collect().map(_.getString(1)).toSeq
    assert(forX === Seq("P1", "P2", "P3")) // partner-id ascending
  }

  test("randomized parity vs in-memory brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (1 to 600).map(_ => (rnd.nextInt(60).toLong,
      "i" + rnd.nextInt(25)))
    val cap = 6
    val out = ItemSim.topkCosine(rows.toDF("bk", "it").repartition(5),
        "bk", "it", k = 2, maxBasket = cap)
      .collect().map(r => (r.getString(0), r.getInt(4)) -> r.getString(1))
      .toMap
    // brute force
    val baskets = rows.distinct.groupBy(_._1).values
      .map(_.map(_._2).toSet).filter(_.size <= cap).toSeq
    val nI = baskets.flatten.groupBy(identity).map { case (i, o) => i -> o.size }
    val pairCounts = baskets.flatMap(b =>
        b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, o) => p -> o.size }
    val perItem = pairCounts.toSeq.flatMap { case ((a, c), n) =>
      val cos = n / math.sqrt(nI(a).toLong * nI(c))
      Seq((a, c, cos), (c, a, cos))
    }.groupBy(_._1)
    perItem.foreach { case (item, ps) =>
      val want = ps.sortBy(p => (-p._3, p._2)).take(2).map(_._2)
      want.zipWithIndex.foreach { case (other, idx) =>
        assert(out((item, idx + 1)) === other, s"item $item rank ${idx + 1}")
      }
    }
  }
}
