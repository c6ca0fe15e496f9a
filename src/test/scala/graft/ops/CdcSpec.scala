package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def ch(rows: (Long, Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ev_us", "event_id", "op", "value")
  }

  test("latest op wins; a trailing delete removes the key") {
    val got = Cdc.applyChangelog(ch(
      (1L, 10L, 1L, "I", 1.0), (1L, 20L, 2L, "U", 2.0),
      (2L, 10L, 3L, "I", 5.0), (2L, 30L, 4L, "D", 0.0),
      (3L, 5L, 5L, "I", 7.0)))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got === Map(1L -> ((2.0, 20L)), 3L -> ((7.0, 5L))))
  }

  test("delete then re-insert resurrects the key with the new value") {
    val got = Cdc.applyChangelog(ch(
      (1L, 10L, 1L, "I", 1.0), (1L, 20L, 2L, "D", 0.0),
      (1L, 30L, 3L, "I", 9.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 9.0))
  }

  test("equal timestamps break on event_id (the changelog sequence)") {
    val got = Cdc.applyChangelog(ch(
      (1L, 10L, 2L, "U", 2.0), (1L, 10L, 9L, "D", 0.0),
      (2L, 10L, 9L, "U", 3.0), (2L, 10L, 2L, "D", 0.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(2L -> 3.0)) // user 1's final change is the D
  }

  test("SCD2 intervals partition time: every probe matches exactly once") {
    val ev = graft.queries.QueryDsl.events(spark, "/root/testdata/sf0.001")
    val hist = Scd2.history(ev)
    val probes = ev.select(col("user_id"), col("ev_us").as("t"),
      col("event_id"))
    val matched = probes.join(hist,
      probes("user_id") === hist("user_id") &&
        col("valid_from") <= col("t") &&
        (col("t") < col("valid_to") || col("valid_to") === -1L))
      .groupBy(col("event_id")).count()
    assert(matched.where(col("count") =!= 1L).count() === 0L)
    assert(matched.count() === probes.count())
  }
}
