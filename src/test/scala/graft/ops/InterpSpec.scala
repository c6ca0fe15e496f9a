package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class InterpSpec extends AnyFunSuite {
  val xs = Array(0.0, 10.0, 30.0)
  val ys = Array(1.0, 2.0, 4.0)

  test("linear: exact sample points") {
    assert(Interp.linear(xs, ys, 0.0) === 1.0)
    assert(Interp.linear(xs, ys, 10.0) === 2.0)
    assert(Interp.linear(xs, ys, 30.0) === 4.0)
  }

  test("linear: interior interpolation") {
    assert(Interp.linear(xs, ys, 5.0) === 1.5)
    assert(Interp.linear(xs, ys, 20.0) === 3.0)
  }

  test("linear: extrapolation uses edge-interval slope") {
    // left slope (2-1)/10 = 0.1 → at -5: 1 + 0.1*(-5) = 0.5
    assert(Interp.linear(xs, ys, -5.0) === 0.5)
    // right slope (4-2)/20 = 0.1 → at 35: 2 + 0.1*(35-10) = 4.5
    assert(Interp.linear(xs, ys, 35.0) === 4.5)
  }

  test("nearest: interior, midpoint ties go left (scipy 'nearest')") {
    assert(Interp.nearest(xs, ys, 4.9) === 1.0)
    assert(Interp.nearest(xs, ys, 5.0) === 1.0)  // exact midpoint → left
    assert(Interp.nearest(xs, ys, 5.1) === 2.0)
    assert(Interp.nearest(xs, ys, 19.9) === 2.0)
    assert(Interp.nearest(xs, ys, 20.0) === 2.0) // midpoint → left
    assert(Interp.nearest(xs, ys, 20.1) === 4.0)
  }

  test("nearest: extrapolation clamps to edge values") {
    assert(Interp.nearest(xs, ys, -100.0) === 1.0)
    assert(Interp.nearest(xs, ys, 100.0) === 4.0)
  }

  test("intervalIndex: brackets correctly across a larger grid") {
    val grid = Array.tabulate(100)(i => i * 7.5)
    for (i <- 0 until 99; frac <- Seq(0.0, 0.3, 0.9)) {
      val x = grid(i) + frac * 7.5
      val idx = Interp.intervalIndex(grid, x)
      assert(grid(idx) <= x && (idx == 98 || x < grid(idx + 1)),
        s"x=$x idx=$idx")
    }
  }

  test("linear is exact on affine functions (property)") {
    val grid = Array.tabulate(50)(i => i * 3.0)
    val vals = grid.map(x => 2.5 * x - 7.0)
    for (x <- Seq(-10.0, 0.0, 1.5, 74.9, 147.0, 200.0)) {
      assert(math.abs(Interp.linear(grid, vals, x) - (2.5 * x - 7.0)) < 1e-9)
    }
  }
}
