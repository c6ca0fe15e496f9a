package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class GoldenRecordSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("survivorship: ref name survives, MAX numeric, MODE categorical with tie") {
    import spark.implicits._
    val reference = Seq(
      (100L, "Acme Corp", 50.0, "AUTO"),
      (200L, "Bolt Ltd", 80.0, "HOUSE"),
      (300L, "Cog Inc", 10.0, "AUTO")) // unlinked: must not appear
      .toDF("key", "name", "bal", "seg")
    val probe = Seq(
      (1L, "Acme Corpp", 70.0, "BIKE"),   // -> 100
      (2L, "Acme Co",    30.0, "BIKE"),   // -> 100 (second member)
      (3L, "Bolt Ltd.",  99.0, "HOUSE"))  // -> 200
      .toDF("key", "name", "bal", "seg")
    val pairs = Seq((1L, 100L), (2L, 100L), (3L, 200L))
      .toDF("probe_key", "ref_key")
    val got = GoldenRecord.survivorship(reference, probe, pairs,
      refKey = "key", probeKey = "key", nameCol = "name",
      numAttr = "bal", catAttr = "seg")
      .orderBy("entity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4)))
    assert(got.toSeq === Seq(
      // entity 100: 3 members; BIKE (2) beats AUTO (1); max bal 70
      (100L, 3L, "Acme Corp", 70.0, "BIKE"),
      // entity 200: HOUSE/HOUSE unanimous; max bal 99
      (200L, 2L, "Bolt Ltd", 99.0, "HOUSE")))
  }

  test("categorical tie breaks lexicographically") {
    import spark.implicits._
    val reference = Seq((1L, "R", 1.0, "ZULU")).toDF("key", "name", "bal", "seg")
    val probe = Seq((9L, "R2", 2.0, "ALPHA")).toDF("key", "name", "bal", "seg")
    val pairs = Seq((9L, 1L)).toDF("probe_key", "ref_key")
    val got = GoldenRecord.survivorship(reference, probe, pairs,
      "key", "key", "name", "bal", "seg").collect()(0)
    // 1-1 tie between ZULU and ALPHA -> ALPHA (lexicographic min)
    assert(got.getString(4) === "ALPHA")
  }
}
