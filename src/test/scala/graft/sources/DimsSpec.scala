package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class DimsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("upsert: updates win per key, unmatched rows survive both ways") {
    import spark.implicits._
    val existing = Seq(
      (2022L, 1L, "Bahrain GP", "Sakhir"),
      (2022L, 2L, "Saudi GP", "Jeddah"))
      .toDF("year", "round", "event_name", "circuit")
    val updates = Seq(
      (2022L, 2L, "Saudi Arabian GP", "Jeddah Corniche"), // update
      (2022L, 3L, "Australian GP", "Albert Park"))        // insert
      .toDF("year", "round", "event_name", "circuit")
    val merged = Dims.upsert(existing, updates, Seq("year", "round"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(merged.size === 3)
    assert(merged((2022L, 1L)) === ("Bahrain GP", "Sakhir"))          // untouched
    assert(merged((2022L, 2L)) === ("Saudi Arabian GP", "Jeddah Corniche")) // updated
    assert(merged((2022L, 3L)) === ("Australian GP", "Albert Park"))  // inserted
  }
}
