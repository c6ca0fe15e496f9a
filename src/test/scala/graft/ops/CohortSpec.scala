package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class CohortSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case: cohorts, offsets, and repeat visits collapse") {
    import spark.implicits._
    // period = 10. u1 first@5 (p0), active p0,p1; u2 first@12 (p1),
    // active p1,p3; u3 first@3 (p0), active p0 only (twice — dedup).
    val ev = Seq((1L, 5L), (1L, 17L), (2L, 12L), (2L, 33L), (3L, 3L),
      (3L, 7L)).toDF("u", "us")
    val out = Cohort.retention(ev, "u", "us", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out === Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // u1, u3
      (0L, 1L) -> ((1L, 2L, 0.5)),   // u1 back in p1
      (1L, 0L) -> ((1L, 1L, 1.0)),   // u2
      (1L, 2L) -> ((1L, 1L, 1.0)))) // u2 back in p3
  }

  test("invariants: offset-0 retention is 1, cells never exceed cohort") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val ev = (1 to 2000).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong)).toDF("u", "us")
    val rows = Cohort.retention(ev, "u", "us", 100L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, nAct, size, ret) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nAct <= size)
      if (off == 0L) assert(ret === 1.0)
      assert(off >= 0L) // nobody active before their first event
    }
    // every user appears in exactly one cohort's offset-0 cell
    assert(rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum ===
      ev.select("u").distinct().count())
  }
}
