package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew handling — the other half of the skew story next
  * to SkewOps.saltedAgg (manual salting): for a hot JOIN key, Spark's
  * adaptive execution splits the oversized shuffle partition into
  * subpartitions at runtime when the skew thresholds say so. This
  * spec drives it with a 90%-hot-key join and asserts the executed
  * plan actually took the skew path (`isSkew=true` reads), so the
  * "AQE handles join skew at 100 TB" claim in the docs is a measured
  * behavior, not folklore. */
class AqeSkewJoinSpec extends AnyFunSuite {

  test("AQE splits a hot join key's partition (skew=true in the executed plan)") {
    val base = graft.SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        // no broadcast: force a shuffle join so skew handling applies
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        // tiny thresholds so the hot partition counts as skewed here
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .getOrCreate()
      import s.implicits._
      // 90% of the left rows share one key; right side is uniform
      val left = s.range(200000L)
        .select((when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 97))
          .as("k"), col("id").as("v"))
      val right = s.range(97L).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // materialize THIS DataFrame (count() would plan its own query
      // and the inspected AdaptiveSparkPlan would never finalize)
      val n = joined.collect().length
      assert(n === 200000) // every left row matches exactly one right row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skewed"),
        s"expected a skew-split shuffle read in:\n${plan.take(3000)}")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
