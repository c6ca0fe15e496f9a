package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotLongSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("vec_dot_long / vec_sqdist_long equal the HOF folds they replace") {
    import spark.implicits._
    VecDotLong.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextInt(2000001).toLong - 1000000L),
      Seq.fill(64)(rnd.nextInt(2000001).toLong - 1000000L)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      expr("vec_dot_long(a, b)").as("dot"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("dot_ref"),
      expr("vec_sqdist_long(a, b)").as("sq"),
      expr("aggregate(zip_with(a, b, (x, c) -> (x - c) * (x - c)), " +
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("sq_ref"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("length mismatch takes the common prefix; codegen and eval agree") {
    import spark.implicits._
    VecDotLong.register(spark)
    val df = Seq((Seq(2L, 3L, 5L), Seq(7L, 11L))).toDF("a", "b")
    val r = df.select(expr("vec_dot_long(a, b)"),
      expr("vec_sqdist_long(a, b)")).head()
    assert(r.getLong(0) === 2 * 7 + 3 * 11)
    assert(r.getLong(1) === 25 + 64)
    // interpreted path (nullSafeEval) agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def arr(xs: Long*) = Literal.create(xs.toArray, ArrayType(LongType))
    assert(VecDotLong(arr(2L, 3L), arr(4L, 5L)).eval(null) === 23L)
    assert(VecSqDistLong(arr(2L, 3L), arr(4L, 6L)).eval(null) === 13L)
  }
}
