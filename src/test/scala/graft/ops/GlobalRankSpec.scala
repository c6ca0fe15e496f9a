package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("equals the single-partition window rank on shuffled data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextDouble() * 1000 - 500))
      .toDF("id", "v").repartition(8)
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = GlobalRank.withGlobalRank(df, "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("duplicate values rank contiguously with the tie-break order") {
    import spark.implicits._
    val df = Seq((3L, 1.0), (1L, 1.0), (2L, 0.5), (4L, 2.0))
      .toDF("id", "v")
    val got = GlobalRank.withGlobalRank(df, "v", "id")
      .orderBy("rn").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 1L), (1L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("all-equal values degenerate to one bucket, still correct") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 42.0)).toDF("id", "v")
    val got = GlobalRank.withGlobalRank(df, "v", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1 to 100).foreach(i => assert(got(i.toLong) === i.toLong))
  }

  test("extreme values at bucket edges (min, max, clamp) rank correctly") {
    import spark.implicits._
    val df = Seq((1L, -1e300), (2L, 0.0), (3L, 1e300), (4L, 1e300 - 1e284))
      .toDF("id", "v")
    val got = GlobalRank.withGlobalRank(df, "v", "id", buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 4L -> 3L, 3L -> 4L))
  }

  test("the corpus-sized rank window is keyed on _bucket") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 97) * 1.5)).toDF("id", "v")
    val exec = GlobalRank.withGlobalRank(df, "v", "id").queryExecution
    val windows = exec.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 2, exec.optimizedPlan.toString)
    // the row_number rank window (corpus-sized input) partitions on
    // _bucket; the offsets cum-sum window is the only unkeyed one and
    // sees only the <=B-row bucket table
    val rankW = windows.filter(_.windowExpressions.exists(
      _.toString.contains("row_number")))
    assert(rankW.size === 1)
    assert(rankW.head.partitionSpec.nonEmpty)
    // the offsets cum-sum window sees only the <=B-row bucket table and
    // partitions on the constant-valued pmod guard (single partition by
    // construction, but with a non-empty spec so WindowExec never warns)
    val offsetW = windows.filterNot(_.windowExpressions.exists(
      _.toString.contains("row_number")))
    assert(offsetW.head.partitionSpec.nonEmpty)
  }
}
