package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("two chained increments equal the full recompute, bag-exact") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
    // three arrival waves per side
    def cw(i: Int) = cust.where(pmod(col("c_custkey"), lit(3)) === i)
    def ow(i: Int) = ord.where(pmod(col("o_orderkey"), lit(3)) === i)
    val keys = Seq("c_custkey")

    var viewDf = cw(0).join(ow(0), keys)
    var (cAcc, oAcc) = (cw(0), ow(0))
    for (i <- 1 to 2) {
      viewDf = IncrementalJoin.maintain(viewDf, cAcc, cw(i), oAcc, ow(i), keys)
      cAcc = cAcc.unionByName(cw(i)); oAcc = oAcc.unionByName(ow(i))
    }
    val full = cust.join(ord, keys)
    // bag equality: counts match and per-row multiset difference empty
    assert(viewDf.count() === full.count())
    assert(viewDf.exceptAll(full).count() === 0L)
    assert(full.exceptAll(viewDf).count() === 0L)
  }
}
