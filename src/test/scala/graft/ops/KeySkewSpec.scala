package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class KeySkewSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def row(df: org.apache.spark.sql.DataFrame) = df.collect()(0)

  test("uniform keys: gini 0, share 1/k") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 4, i)).toDF("k", "x")
    val r = row(KeySkew.profile(df, "k"))
    assert(r.getAs[Long]("n_rows") === 100L)
    assert(r.getAs[Long]("n_keys") === 4L)
    assert(r.getAs[Double]("top_share") === 0.25)
    assert(r.getAs[Double]("gini") === 0.0)
  }

  test("hand-computed skew: freqs 1,1,8 over 10 rows") {
    import spark.implicits._
    // keys: a×8, b×1, c×1 → ranked asc (b,1),(c,1),(a,8)
    // gini = (2*(1*1+2*1+3*8) - 4*10) / (3*10) = (54-40)/30 = 14/30
    val vals = Seq.fill(8)("a") ++ Seq("b", "c")
    val df = vals.zipWithIndex.toDF("k", "x")
    val r = row(KeySkew.profile(df, "k"))
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[String]("top_key") === "a")
    assert(r.getAs[Double]("top_share") === 0.8)
    assert(r.getAs[Double]("gini") === 14.0 / 30.0)
  }

  test("one key owns everything: share 1, gini 0 (single key is uniform)") {
    import spark.implicits._
    val df = Seq.fill(50)(("hot", 1)).toDF("k", "x")
    val r = row(KeySkew.profile(df, "k"))
    assert(r.getAs[Double]("top_share") === 1.0)
    assert(r.getAs[Double]("gini") === 0.0)
  }

  test("top_key tie-break: equal counts pick the greater key") {
    import spark.implicits._
    val df = Seq(("x", 1), ("y", 1)).toDF("k", "v")
    assert(row(KeySkew.profile(df, "k")).getAs[String]("top_key") === "y")
  }

  test("null keys are counted as a key") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), None, None, None)
      .zipWithIndex.toDF("k", "x")
    val r = row(KeySkew.profile(df, "k"))
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Double]("top_share") === 0.6)
  }
}
