package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Date

class TimeSeriesCvSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def ordersOn(dates: String*) = {
    import spark.implicits._
    dates.map(Date.valueOf).toList.toDF("o_orderdate")
  }

  test("embargo purges the train window strictly before test − 30 days") {
    // Rows: one on 2020-03-20 (inside Q1 and inside Q2's 30-day
    // embargo), one on 2020-02-15 (Q1, before Q2's embargo cutoff
    // 2020-03-02), two in Q2.
    val got = TimeSeriesCv.quarterlyFolds(
      ordersOn("2020-02-15", "2020-03-20", "2020-04-10", "2020-05-01"))
      .orderBy("fold_id").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDate(2).toString,
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (20201L, "2020-01-01", "2020-03-31", 0L, 2L),
      // Q2 train: only 2020-02-15 survives the embargo (cutoff 03-02);
      // 2020-03-20 is purged even though it precedes the test window.
      (20202L, "2020-04-01", "2020-06-30", 1L, 2L)))
  }

  test("expanding windows: n_train is nondecreasing across folds") {
    val got = TimeSeriesCv.quarterlyFolds(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet"))
      .orderBy("fold_id").collect()
    assert(got.length > 10)
    val trains = got.map(_.getLong(3)).toSeq
    assert(trains === trains.sorted)
    // totals: every order is tested exactly once across folds
    val nOrders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(got.map(_.getLong(4)).sum === nOrders)
  }
}
