package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class JoinCardinalitySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("estimate equals the true inner-join row count, incl. many-to-many") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 2000).map(_ => rnd.nextInt(50).toLong).toDF("k")
    val right = (1 to 800).map(_ => rnd.nextInt(60).toLong).toDF("k2")
    val est = JoinCardinality.estimate(Seq(
        JoinCardinality.Relation("r", left, "k", right, "k2")))
      .collect()(0)
    val actual = left.join(right, left("k") === right("k2")).count()
    assert(est.getAs[Long]("n_join_rows") === actual)
    assert(est.getAs[Long]("n_left") === 2000L)
    assert(est.getAs[Long]("n_right") === 800L)
  }

  test("null keys count in side totals but never match") {
    import spark.implicits._
    val left = Seq(Some(1L), Some(1L), None, None).toDF("k")
    val right = Seq(Some(1L), None).toDF("k2")
    val est = JoinCardinality.estimate(Seq(
        JoinCardinality.Relation("n", left, "k", right, "k2")))
      .collect()(0)
    assert(est.getAs[Long]("n_left") === 4L)
    assert(est.getAs[Long]("n_right") === 2L)
    assert(est.getAs[Long]("n_join_rows") === 2L) // only the two 1s x one 1
    assert(est.getAs[Long]("max_key_pairs") === 2L)
  }

  test("max_key_pairs isolates the straggler key") {
    import spark.implicits._
    val left = (Seq.fill(100)(7L) ++ Seq(1L, 2L)).toDF("k")
    val right = (Seq.fill(30)(7L) ++ Seq(1L)).toDF("k2")
    val est = JoinCardinality.estimate(Seq(
        JoinCardinality.Relation("s", left, "k", right, "k2")))
      .collect()(0)
    assert(est.getAs[Long]("max_key_pairs") === 3000L)
    assert(est.getAs[Long]("n_join_rows") === 3001L)
  }
}
