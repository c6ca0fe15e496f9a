package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class QuantileRegSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("bias-only fit walks to the sample median, ignoring upward outliers") {
    import spark.implicits._
    // 81 rows at y=10 plus 19 huge outliers: median 10; a mean fit
    // would land near 200 — robustness is the point of the op.
    val rows = Seq.fill(81)(10.0) ++ Seq.fill(19)(1000.0)
    val xy = rows.map(y => (y, 1L, 0L, 0L, 0L))
      .toDF("y", "x0", "x1", "x2", "x3")
    val got = QuantileReg.train(xy, iters = 8, etaQ = 20000000L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val bias = got(0).toDouble / QuantileReg.Q
    // 1/t schedule from 0: partial sums of ±(10,5,3.33,...) land near
    // the median, not the mean
    assert(bias > 5.0 && bias < 20.0, s"bias $bias")
    assert(got(1) === 0L && got(2) === 0L && got(3) === 0L)
  }

  test("gate fit lands near the unconditional median and is repartition-exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def feats(df: org.apache.spark.sql.DataFrame) = df.select(
      col("l_quantity").as("y"), lit(1L).as("x0"),
      expr("l_orderkey % 5").as("x1"),
      col("l_linenumber").cast("long").as("x2"),
      expr("l_suppkey % 7").as("x3"))
    val a = QuantileReg.train(feats(li), iters = 8, etaQ = 20000000L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val b = QuantileReg.train(feats(li.repartition(11)), iters = 8,
      etaQ = 20000000L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(a === b) // bit-exact under repartitioning
    // convergence-to-median check: at the conditional median the
    // pinball subgradient balances, i.e. ~half the residuals are
    // positive. (The LEVEL spreads across all positively-correlated
    // features, so asserting on the bias alone is wrong — the sign
    // balance is the quantity the loss actually drives to 1/2.)
    val w = a.toMap
    val posFrac = feats(li)
      .withColumn("yq", floor(col("y") * lit(QuantileReg.Q.toDouble)).cast("long"))
      .withColumn("pred",
        lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
          lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      .agg(avg(when(col("yq") > col("pred"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(posFrac > 0.35 && posFrac < 0.65,
      s"positive-residual fraction $posFrac (should balance near 0.5)")
  }
}
