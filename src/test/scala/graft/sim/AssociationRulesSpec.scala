package graft.sim

import org.scalatest.funsuite.AnyFunSuite

class AssociationRulesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // 4 baskets: {x,y} {x,y} {x} {y,z} → c_x=3, c_y=3, c_z=1, c_xy=2
  private def df = Seq(
    (1L, "x"), (1L, "y"),
    (2L, "x"), (2L, "y"),
    (3L, "x"),
    (4L, "y"), (4L, "z"))
    .toDF("bk", "it")

  test("support, confidence, lift by hand") {
    val out = ItemSim.associationRules(df, "bk", "it",
      minPairCount = 2L, maxBasket = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.size == 2, "only the x,y pair clears minPairCount")
    val (supXY, confXY, liftXY) = out(("x", "y"))
    assert(supXY == 0.5)           // 2/4
    assert(confXY == 2.0 / 3.0)    // 2/3
    assert(liftXY == 8.0 / 9.0)    // 2*4/(3*3)
    val (_, confYX, liftYX) = out(("y", "x"))
    assert(confYX == 2.0 / 3.0 && liftYX == liftXY,
      "lift symmetric, confidence per direction")
  }

  test("minPairCount prunes and the basket cap drops mega-baskets") {
    val mega = (1 to 20).map(i => (9L, s"m$i")).toDF("bk", "it")
    val out = ItemSim.associationRules(df.union(mega), "bk", "it",
      minPairCount = 2L, maxBasket = 10)
    assert(out.filter($"antecedent".startsWith("m")).count() == 0,
      "capped basket contributes no pairs")
    assert(out.count() == 2)
  }

  test("independent items have lift 1, positively associated > 1") {
    // x,y co-occur in the even baskets; z is in EVERY basket (so z is
    // independent of x: P(xz) = P(x)·P(z))
    val baskets = (1 to 40).flatMap { i =>
      val base = Seq((i.toLong, "z"))
      if (i % 2 == 0) base ++ Seq((i.toLong, "x"), (i.toLong, "y"))
      else base :+ (i.toLong, "a")
    }.toDF("bk", "it")
    val out = ItemSim.associationRules(baskets, "bk", "it", 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5))
      .toMap
    assert(out(("x", "y")) == 2.0, "perfect half-corpus co-occurrence")
    assert(out(("x", "z")) == 1.0, "independent → lift exactly 1")
  }
}
