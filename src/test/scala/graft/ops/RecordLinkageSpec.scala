package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val ref = Seq(
    (1L, 1, "jonathan smith"),
    (2L, 1, "elizabeth jones"),
    (3L, 2, "jonathan smith"), // same name, other block
    (4L, 1, "bob"))
    .toDF("id", "blk", "name")

  test("typos resolve to the right entity within the block") {
    val probe = Seq(
      (101L, 1, "jonathan smyth"),   // 1 edit from id 1
      (102L, 1, "elizabeth joness"), // 1 edit from id 2
      (103L, 1, "zzzzzz"))           // matches nothing
      .toDF("id", "blk", "name")
    val out = RecordLinkage.bestMatch(probe, ref, "id", "id", "name",
      Seq("blk"), maxEdit = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(4))).toMap
    assert(out(101L) == ((1L, 1)))
    assert(out(102L) == ((2L, 1)))
    assert(!out.contains(103L), "no forced match for junk")
  }

  test("blocking respects the exact block columns") {
    val probe = Seq((201L, 2, "jonathan smith")).toDF("id", "blk", "name")
    val out = RecordLinkage.bestMatch(probe, ref, "id", "id", "name",
      Seq("blk"), maxEdit = 2).collect()
    assert(out.length == 1 && out.head.getLong(1) == 3L,
      "matches the in-block twin, not the out-of-block one")
  }

  test("lossless banding: a cross-band-boundary typo still matches") {
    // bandWidth 4: length 8 is band 2, length 7 is band 1 — a
    // one-char deletion crosses the boundary and must still be found
    val r2 = Seq((1L, 1, "abcdefgh")).toDF("id", "blk", "name")
    val probe = Seq((9L, 1, "abcdefg")).toDF("id", "blk", "name")
    val out = RecordLinkage.bestMatch(probe, r2, "id", "id", "name",
      Seq("blk"), maxEdit = 2).collect()
    assert(out.length == 1 && out.head.getInt(4) == 1)
  }

  test("ties resolve to the smallest reference key (total order)") {
    val r3 = Seq((5L, 1, "aaaa"), (6L, 1, "aaab")).toDF("id", "blk", "name")
    val probe = Seq((7L, 1, "aaac")).toDF("id", "blk", "name")
    val out = RecordLinkage.bestMatch(probe, r3, "id", "id", "name",
      Seq("blk"), maxEdit = 2).collect()
    assert(out.head.getLong(1) == 5L)
  }
}
