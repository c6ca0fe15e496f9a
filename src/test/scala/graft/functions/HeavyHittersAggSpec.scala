package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import HeavyHittersAgg.{HeavyHitters, Item}

class HeavyHittersAggSpec extends AnyFunSuite {

  private def run(agg: HeavyHitters, xs: Seq[String],
      splits: Int = 4): Map[String, Long] = {
    val parts = xs.grouped(math.max(1, xs.size / splits)).toSeq
    val bufs = parts.map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, Item(x))))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  test("capacity >= distinct items gives exact counts under any split") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      Seq.fill(3)("d")
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (splits <- Seq(1, 3, 7)) {
      assert(run(new HeavyHitters(8), scala.util.Random.shuffle(xs), splits)
        === exact)
    }
  }

  test("MG guarantee at low capacity: frequent items survive, undercount bounded") {
    val rnd = new scala.util.Random(7)
    val n = 2000
    // one heavy key (30%), rest spread over a wide tail
    val xs = rnd.shuffle(Seq.fill(600)("heavy") ++
      (1 to n - 600).map(i => s"t${i % 500}"))
    val cap = 9
    val got = run(new HeavyHitters(cap), xs)
    assert(got.size <= cap)
    // any item with freq > n/(cap+1) = 200 must be present
    assert(got.contains("heavy"))
    // reported counts never overcount and undercount by <= n/(cap+1)
    got.foreach { case (k, c) =>
      val truth = xs.count(_ == k).toLong
      assert(c <= truth, s"$k overcounted")
      assert(truth - c <= n / (cap + 1), s"$k undercount ${truth - c}")
    }
  }
}
