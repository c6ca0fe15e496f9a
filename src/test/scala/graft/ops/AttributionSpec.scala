package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case: splits, multi-purchase views, window cutoff") {
    import spark.implicits._
    // user 1: views v1@10, v2@20; purchases p1@30 ($10 → $5 each),
    //   p2@25 ($4 → v1,v2 both within window? v1@10..25 yes, v2@20..25
    //   yes → $2 each)
    // user 2: view v3@100; purchase p3@100+W+1 (outside window → no credit)
    val W = 50L
    val views = Seq((1L, 101L, 10L), (1L, 102L, 20L), (2L, 103L, 100L))
      .toDF("user_id", "view_id", "vus")
    val purchases = Seq((1L, 201L, 30L, 10.0), (1L, 202L, 25L, 4.0),
        (2L, 203L, 151L, 99.0))
      .toDF("user_id", "purchase_id", "pus", "value")
    val out = Attribution.linearCredit(views, purchases, W)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out === Map(101L -> ((2L, 7.0)), 102L -> ((2L, 7.0))))
  }

  test("credit conservation: total credit = value of attributed purchases") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val views = (1 to 300).map(i =>
        (rnd.nextInt(20).toLong, 1000L + i, rnd.nextInt(1000).toLong))
      .toDF("user_id", "view_id", "vus")
    val purchases = (1 to 100).map(i =>
        (rnd.nextInt(20).toLong, 2000L + i, rnd.nextInt(1200).toLong,
          rnd.nextInt(500) / 10.0))
      .toDF("user_id", "purchase_id", "pus", "value")
    val W = 200L
    val total = Attribution.linearCredit(views, purchases, W)
      .agg(org.apache.spark.sql.functions.sum("credit_total"))
      .collect()(0).getDouble(0)
    // purchases with >= 1 touching view contribute their full value
    val attributed = purchases.as("p").join(views.as("v"),
        $"p.user_id" === $"v.user_id" && $"p.pus" >= $"v.vus" &&
          $"p.pus" <= $"v.vus" + W, "left_semi")
      .agg(org.apache.spark.sql.functions.sum("value"))
      .collect()(0).getDouble(0)
    // rounding each split to 6dp loses < 1e-6 per (view, purchase) pair
    assert(math.abs(total - attributed) < 1e-3,
      s"total=$total attributed=$attributed")
  }
}
