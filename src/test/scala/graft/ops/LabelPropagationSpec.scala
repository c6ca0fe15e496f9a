package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toList.toDF("u", "v")
  }

  test("two triangles with a bridge split into two communities") {
    // hand-traced 3 sync rounds with the (count desc, label asc)
    // tiebreak: {1,2,3} -> 1, {4,5,6} -> 3
    val got = LabelPropagation.communities(
      edges((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
        (3L, 4L)))
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)))
  }

  test("a clique converges to one community labeled by its min id") {
    val got = LabelPropagation.communities(
      edges((10L, 11L), (10L, 12L), (11L, 12L)))
      .collect().map(r => (r.getLong(1), r.getLong(2))).distinct
    assert(got.toSeq === Seq((10L, 3L)))
  }

  test("item communities are deterministic and partition all capped-basket items") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = LabelPropagation.itemCommunities(li).orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = LabelPropagation.itemCommunities(li.repartition(9))
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // more than one community, and no singleton-only degenerate split
    val comms = a.map(_._2).distinct
    assert(comms.size > 1 && comms.size < a.size)
  }
}
