package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import BoundedCollectAgg.BoundedCollect

class BoundedCollectAggSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("under-cap groups keep the COMPLETE element set on any split") {
    val rnd = new scala.util.Random(7)
    val agg = new BoundedCollect(13)
    for (trial <- 1 to 200) {
      val xs = Seq.fill(rnd.nextInt(13))(rnd.nextLong())
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).sorted === xs.sorted, s"trial $trial")
    }
  }

  test("over-cap groups saturate at exactly cap, never more") {
    val agg = new BoundedCollect(5)
    val full = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(full.size === 5)
    // merging two saturated partials stays saturated
    assert(agg.merge(full, full).size === 5)
    // merging partials that jointly exceed the cap truncates to cap
    val a = (1L to 3L).foldLeft(agg.zero)(agg.reduce)
    val b = (4L to 7L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b).size === 5)
    intercept[IllegalArgumentException](new BoundedCollect(0))
  }

  test("finish enforces the truncation contract: saturated groups are NULL") {
    val agg = new BoundedCollect(5)
    // saturated buffer (true df >= cap): content is partition-order
    // dependent, so it must never escape — finish returns null
    val full = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(full) === null)
    // exactly-at-cap groups are indistinguishable from truncated ones
    // and are over the rare-gram threshold anyway: also null
    val atCap = (1L to 5L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(atCap) === null)
    // one under the cap: complete, returned
    val under = (1L to 4L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(under).sorted === (1L to 4L))
  }

  test("as a UDAF it matches collect_list-then-filter on a skewed frame") {
    import spark.implicits._
    // one hot key (df 500) + rare keys with df 1..4
    val rows = (1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 10).flatMap(k => (1 to (k % 4) + 1).map(i => (s"rare$k", i.toLong)))
    val df = rows.toDF("g", "id").repartition(8)
    val got = df.groupBy("g")
      .agg(BoundedCollectAgg.boundedCollect(5)(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 4))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val want = df.groupBy("g").agg(collect_list("id").as("ids"))
      .filter(size(col("ids")).between(2, 4))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(got === want)
    assert(!got.contains("hot"))
  }
}
