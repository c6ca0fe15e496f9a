package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import TopKAgg.{TopK, ValueKey}

class TopKAggSpec extends AnyFunSuite {

  private def refTopK(xs: Seq[ValueKey], k: Int): Seq[ValueKey] =
    xs.sortBy(v => (-v.value, v.id)).take(k)

  test("reduce and merge agree with sort-based reference on random splits") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val k = 1 + rnd.nextInt(8)
      val agg = new TopK(k)
      val n = rnd.nextInt(40)
      // duplicated values force the id tie-break path
      val xs = Seq.fill(n)(ValueKey(rnd.nextInt(10).toDouble, rnd.nextLong().abs))
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === refTopK(xs, k), s"trial $trial k=$k")
    }
  }

  test("buffer never exceeds k and rejects non-positive k") {
    val agg = new TopK(3)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, ValueKey(i.toDouble, i.toLong)))
    assert(buf.size === 3)
    assert(buf.map(_.value) === Seq(100.0, 99.0, 98.0))
    intercept[IllegalArgumentException](new TopK(0))
  }
}
