package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LogregGdSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def xy(rows: (Long, Long, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("y", "x0", "x1", "x2", "x3")
  }

  test("hand case: one step from zero weights reproduces the formula") {
    // w=0 → z=0 → pq = floor(2W/4) = W/2 for every row.
    // grad_j = Σ (W/2 − y·W)·x_j; wq_j = −floor(grad_j / (2n)).
    val rows = Seq[(Long, Long, Long, Long, Long)](
      (1L, 1L, 4L, 0L, 0L), (0L, 1L, 2L, 0L, 0L),
      (1L, 1L, 6L, 0L, 0L), (0L, 1L, 0L, 0L, 0L))
    val W = LogregGd.W
    val n = rows.size
    val grad = Array.ofDim[Long](4)
    rows.foreach { case (y, x0, x1, x2, x3) =>
      val e = W / 2 - y * W
      grad(0) += e * x0; grad(1) += e * x1; grad(2) += e * x2; grad(3) += e * x3
    }
    val expected = grad.map(g => -math.floor(g.toDouble / (2.0 * n)).toLong)
    val got = LogregGd.train(xy(rows: _*), iters = 1)
      .orderBy("feature_idx").collect().map(_.getLong(1))
    assert(got.toSeq === expected.toSeq)
  }

  test("separable data: weights point the right way and classify it") {
    // y=1 iff x1 large — after 3 steps the learned margin must rank
    // every positive above every negative
    val rows = (1 to 40).map { i =>
      val y = if (i % 2 == 0) 1L else 0L
      val x1 = if (y == 1L) 80L + i % 5 else 10L + i % 5
      (y, 1L, x1, (i % 3).toLong, 0L)
    }
    val w = LogregGd.train(xy(rows: _*), iters = 3)
      .orderBy("feature_idx").collect().map(_.getLong(1))
    val margins = rows.map { case (y, x0, x1, x2, x3) =>
      (y, w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3)
    }
    val maxNeg = margins.filter(_._1 == 0L).map(_._2).max
    val minPos = margins.filter(_._1 == 1L).map(_._2).min
    assert(minPos > maxNeg)
  }

  test("deterministic across partitionings") {
    val rows = (1 to 100).map { i =>
      ((i % 2).toLong, 1L, (i % 17).toLong, (i % 7).toLong, (i % 3).toLong)
    }
    val base = xy(rows: _*)
    val a = LogregGd.train(base.repartition(1), iters = 2)
      .orderBy("feature_idx").collect().map(_.getLong(1)).toSeq
    val b = LogregGd.train(base.repartition(7), iters = 2)
      .orderBy("feature_idx").collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }
}
