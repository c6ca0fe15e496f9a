package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileNormSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case: group ranks map to global order statistics") {
    import spark.implicits._
    // global sorted values: 1,2,3,4,5,6 (N=6)
    // group a = {1,3,5} (n=3): ranks 1,2,3 → j = ceil(r·6/3) = 2,4,6
    //   → norm 2,4,6
    // group b = {2,4,6}: same js → norm 2,4,6
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0),
      (4L, "b", 4.0), (5L, "a", 5.0), (6L, "b", 6.0))
      .toDF("id", "g", "v")
    val out = QuantileNorm.toGlobalReference(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("norm_value")).toMap
    assert(out === Map(1L -> 2.0, 3L -> 4.0, 5L -> 6.0,
      2L -> 2.0, 4L -> 4.0, 6L -> 6.0))
  }

  test("properties: monotone within group, max maps to global max") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val df = (1 to 900).map(i => (i.toLong, "g" + rnd.nextInt(4),
      rnd.nextInt(500).toDouble)).toDF("id", "g", "v")
    val rows = QuantileNorm.toGlobalReference(df, "g", "v", "id")
      .select("g", "grp_rank", "grp_n", "norm_value", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val globalMax = rows.map(_._5).max
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // normalized sequence is non-decreasing in group rank
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0)._4 <= p(1)._4))
      // top-ranked row maps to the global maximum (j = N)
      assert(sorted.last._4 === globalMax)
    }
    // a whole-corpus group would be the identity map on sorted values
    val single = (1 to 50).map(i => (i.toLong, "only", i.toDouble))
      .toDF("id", "g", "v")
    QuantileNorm.toGlobalReference(single, "g", "v", "id")
      .collect().foreach { r =>
        assert(r.getAs[Double]("norm_value") === r.getAs[Double]("v"))
      }
  }
}
