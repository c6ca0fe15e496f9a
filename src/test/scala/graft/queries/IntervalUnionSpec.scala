package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-verified sweep cases for the interval-union gate (the gate
  * itself reads events; the kernel is replicated here over planted
  * intervals via the same expressions). */
class IntervalUnionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def union(iv: Seq[(Long, Long, Long)]): (Long, Long) = {
    // (user fixed) iv = (event_id, st, en)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
    val run = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val r = iv.map { case (e, s, en) => (1L, e, s, en) }
      .toDF("user_id", "event_id", "st", "en")
      .withColumn("prev_max_en", max(col("en")).over(run))
      .withColumn("is_new",
        when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1L)
          .otherwise(0L))
      .withColumn("contrib",
        greatest(col("en"), coalesce(col("prev_max_en"), col("st"))) -
          greatest(col("st"), coalesce(col("prev_max_en"), col("st"))))
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n"), sum(col("contrib")).as("len"))
      .collect().head
    (r.getLong(1), r.getLong(2))
  }

  test("overlap, touch, nest, and gap merge to the exact union length") {
    // [0,10) ∪ [5,15) = [0,15)                        → 1 run, 15
    assert(union(Seq((1L, 0L, 10L), (2L, 5L, 15L))) === ((1L, 15L)))
    // touching [0,5) ∪ [5,10) merges (half-open)      → 1 run, 10
    assert(union(Seq((1L, 0L, 5L), (2L, 5L, 10L))) === ((1L, 10L)))
    // nested [0,20) ⊇ [5,10) adds nothing             → 1 run, 20
    assert(union(Seq((1L, 0L, 20L), (2L, 5L, 10L))) === ((1L, 20L)))
    // disjoint with gap                               → 2 runs, 10
    assert(union(Seq((1L, 0L, 5L), (2L, 100L, 105L))) === ((2L, 10L)))
    // nested then extending past the container
    assert(union(Seq((1L, 0L, 20L), (2L, 5L, 10L), (3L, 15L, 30L))) === ((1L, 30L)))
  }

  test("corpus gate invariants: bounds vs event counts") {
    val len = 300000000L
    val rows = SparkEntry.queries("a_interval_union")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nm, cov, ne) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nm >= 1L && nm <= ne)
      assert(cov >= len && cov <= ne * len)
    }
  }
}
