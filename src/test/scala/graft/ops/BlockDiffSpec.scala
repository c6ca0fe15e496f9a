package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class BlockDiffSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def snap(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
  private def diff(a: Seq[(Long, String)], b: Seq[(Long, String)], buckets: Int = 16) =
    BlockDiff.changedBuckets(snap(a), snap(b), "doc_id", Seq("text"), buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

  private val base = (0L until 64L).map(i => (i, s"content of $i"))

  test("identical snapshots: zero changed buckets") {
    assert(diff(base, base).isEmpty)
  }

  test("one edited row flags exactly its bucket") {
    val b = base.map { case (id, t) => if (id == 37L) (id, t + "!") else (id, t) }
    val got = diff(base, b)
    assert(got.map(_._1).toSeq === Seq(37L % 16))
    assert(got.head._2 === got.head._3) // count unchanged, xor differs
  }

  test("delete and insert flag their buckets with count mismatch") {
    val b = base.filterNot(_._1 == 5L) :+ ((100L, "new doc"))
    val got = diff(base, b).map { case (bk, na, nb) => bk -> ((na, nb)) }.toMap
    // bucket 5 lost a row; bucket 100%16=4 gained one
    assert(got(5L % 16)._1 === got(5L % 16)._2 + 1)
    assert(got(100L % 16)._2 === got(100L % 16)._1 + 1)
    assert(got.size === 2)
  }

  test("xor self-inverse: unchanged rows cancel even in churned buckets") {
    // bucket 0 holds ids 0,16,32,48; editing id 16 must flag bucket 0
    // without the unchanged ids 0/32/48 masking or corrupting the xor:
    // reverting the edit un-flags it exactly
    val edited = base.map { case (id, t) => if (id == 16L) (id, "X") else (id, t) }
    assert(diff(base, edited).map(_._1).toSeq === Seq(0L))
    val reverted = edited.map { case (id, t) => if (id == 16L) (id, s"content of $id") else (id, t) }
    assert(diff(base, reverted).isEmpty)
  }

  test("equal-count different-content bucket still flags (xor catches it)") {
    // swap the contents of ids 3 and 19 (same bucket 3): counts equal,
    // per-row hashes change because the hash binds id|content
    val b = base.map {
      case (3L, _) => (3L, "content of 19")
      case (19L, _) => (19L, "content of 3")
      case r => r
    }
    val got = diff(base, b)
    assert(got.map(_._1).toSeq === Seq(3L))
    assert(got.head._2 === got.head._3)
  }
}
