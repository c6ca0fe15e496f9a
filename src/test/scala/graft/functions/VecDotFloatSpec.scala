package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotFloatSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("vec_dot equals the zip_with+aggregate fold bit-for-bit") {
    import spark.implicits._
    VecDotFloat.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .filter(col("qid") < 20)
      .crossJoin(emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
        .filter(col("nid") < 20))
    val both = pairs.select(
      expr("vec_dot(qe, ne)").as("native"),
      expr("aggregate(zip_with(qe, ne, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot handles nulls, empty arrays, and length mismatch") {
    VecDotFloat.register(spark)
    val df = spark.sql(
      """SELECT vec_dot(cast(array(1.0, 2.0) as array<float>),
        |               cast(array(3.0, 4.0, 5.0) as array<float>)) AS mismatch,
        |       vec_dot(cast(array() as array<float>),
        |               cast(array() as array<float>)) AS empty,
        |       vec_dot(cast(null as array<float>),
        |               cast(array(1.0) as array<float>)) AS withnull""".stripMargin)
    val r = df.head
    assert(r.getDouble(0) === 11.0) // common prefix
    assert(r.getDouble(1) === 0.0)
    assert(r.isNullAt(2))
  }

  test("the whole-stage-codegen path and interpreted path agree") {
    import spark.implicits._
    VecDotFloat.register(spark)
    val df = Seq((Array(1.5f, -2.5f, 3.0f), Array(0.5f, 4.0f, -1.0f)))
      .toDF("qe", "ne")
    val expected = 1.5 * 0.5 + (-2.5) * 4.0 + 3.0 * (-1.0)
    // codegen on (default)
    assert(df.select(expr("vec_dot(qe, ne)")).head.getDouble(0) === expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.select(expr("vec_dot(qe, ne)")).head.getDouble(0) === expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
