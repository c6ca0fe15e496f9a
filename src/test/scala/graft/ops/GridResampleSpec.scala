package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import GridResample._

class GridResampleSpec extends AnyFunSuite {

  private def s(x: Long, y: Double, seq: Long = 0): Sample = Sample(1L, x, seq, y)

  test("grid spans [x0, xn] inclusive with exact hits at samples") {
    val out = resampleSeries(1L, Array(s(0, 10.0), s(100, 20.0), s(200, 40.0)), 50).toArray
    assert(out.map(_.x).toSeq === Seq(0L, 50L, 100L, 150L, 200L))
    assert(out.find(_.x == 0).get.y === 10.0)
    assert(out.find(_.x == 100).get.y === 20.0)
    assert(out.find(_.x == 200).get.y === 40.0) // last grid point = raw value
    assert(out.find(_.x == 50).get.y === 15.0)
    assert(out.find(_.x == 150).get.y === 30.0)
  }

  test("duplicate x keeps the smallest seq (deterministic keep-first)") {
    val out = resampleSeries(1L,
      Array(s(0, 10.0, seq = 5), s(0, 99.0, seq = 9), s(100, 20.0)), 100).toArray
    assert(out.find(_.x == 0).get.y === 10.0)
  }

  test("single distinct point yields its one grid point; empty input yields nothing") {
    // matches the SQL oracle's no-next-sample branch: one grid row at
    // the sample itself (keep-first on duplicate x)
    val single = resampleSeries(1L, Array(s(5, 1.0), s(5, 2.0, 1)), 10).toArray
    assert(single.toSeq === Seq(GridPoint(1L, 5L, 1.0)))
    assert(resampleSeries(1L, Array.empty[Sample], 10).isEmpty)
  }

  test("non-aligned span: last grid point <= xn") {
    val out = resampleSeries(1L, Array(s(0, 0.0), s(130, 13.0)), 50).toArray
    assert(out.map(_.x).toSeq === Seq(0L, 50L, 100L))
    assert(math.abs(out.last.y - 10.0) < 1e-12)
  }

  test("unsorted input is sorted before interpolation") {
    val out = resampleSeries(1L, Array(s(200, 40.0), s(0, 10.0), s(100, 20.0)), 100).toArray
    assert(out.map(_.y).toSeq === Seq(10.0, 20.0, 40.0))
  }
}
