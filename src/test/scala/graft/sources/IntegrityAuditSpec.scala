package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class IntegrityAuditSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("clean, broken, and null-FK relations audit correctly") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val cleanChild = Seq(1L, 1L, 2L, 3L).toDF("fk")
    val brokenChild = Seq(1L, 9L, 9L, 2L).toDF("fk")
    val nullChild = Seq(Some(1L), None, Some(2L), None).toDF("fk")
    val out = IntegrityAudit.audit(Seq(
        IntegrityAudit.Relation("clean", cleanChild, "fk", parent, "pk"),
        IntegrityAudit.Relation("broken", brokenChild, "fk", parent, "pk"),
        IntegrityAudit.Relation("nulls", nullChild, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("clean") === ((4L, 0L, 0.0)))
    assert(out("broken") === ((4L, 2L, 0.5)))
    // null FKs orphan (they'd drop in an inner join)
    assert(out("nulls") === ((4L, 2L, 0.5)))
  }

  test("empty child reports 0 orphans, not NULL (truncated-snapshot edge)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L).toDF("fk").where(col("fk") < 0) // empty
    val r = IntegrityAudit.audit(Seq(
        IntegrityAudit.Relation("empty", child, "fk", parent, "pk")))
      .collect()(0)
    assert(r.getAs[Long]("n_child") === 0L)
    // SUM over zero rows is NULL; the audit must coalesce to 0 like
    // the old anti-join count (and the DuckDB mirror's COUNT(*)) did
    assert(!r.isNullAt(r.fieldIndex("n_orphans")))
    assert(r.getAs[Long]("n_orphans") === 0L)
  }

  test("duplicate parent keys do not double-count children") {
    import spark.implicits._
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 5L).toDF("fk")
    val r = IntegrityAudit.audit(Seq(
        IntegrityAudit.Relation("dup", child, "fk", parent, "pk")))
      .collect()(0)
    assert(r.getAs[Long]("n_child") === 3L)
    assert(r.getAs[Long]("n_orphans") === 1L)
  }
}
