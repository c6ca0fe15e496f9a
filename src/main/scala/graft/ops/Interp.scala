package graft.ops

/** Pure-Scala 1-D interpolation over strictly-increasing sample points,
  * matching scipy.interpolate.interp1d semantics used by the reference
  * (F1_Data_PreProcessing.ipynb:80-85):
  *
  *  - `linear` with fill_value="extrapolate": linear extrapolation using
  *    the first/last interval's slope beyond the sample range.
  *  - `nearest` with fill_value="extrapolate": edge values beyond the
  *    range; exact midpoints resolve to the LEFT sample (scipy 'nearest'
  *    rounds half-down via searchsorted(side='left') over bin midpoints).
  *
  * Operates on plain arrays — called per (group, grid point) inside
  * flatMapGroups, so it must be allocation-light and branch-simple.
  */
object Interp {

  /** Largest i in [0, n-2] with xs(i) <= x, clamped for extrapolation
    * (i.e. returns 0 for x < xs(0) and n-2 for x >= xs(n-1)). xs must be
    * strictly increasing with length >= 2. */
  def intervalIndex(xs: Array[Double], x: Double): Int = {
    var lo = 0
    var hi = xs.length - 2
    if (x <= xs(0)) return 0
    if (x >= xs(xs.length - 2)) return xs.length - 2
    // invariant: xs(lo) <= x < xs(hi+1)
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (xs(mid) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  /** Linear interpolation with linear extrapolation (edge-interval slope). */
  def linear(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    if (xs.length == 1) return ys(0)
    val i = intervalIndex(xs, x)
    val slope = (ys(i + 1) - ys(i)) / (xs(i + 1) - xs(i))
    ys(i) + slope * (x - xs(i))
  }

  /** Nearest-neighbor interpolation; midpoint ties take the left sample;
    * out-of-range takes the edge value. */
  def nearest(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    if (xs.length == 1) return ys(0)
    if (x <= xs(0)) return ys(0)
    if (x >= xs(xs.length - 1)) return ys(xs.length - 1)
    val i = intervalIndex(xs, x)
    val mid = (xs(i) + xs(i + 1)) / 2.0
    if (x <= mid) ys(i) else ys(i + 1)
  }
}
