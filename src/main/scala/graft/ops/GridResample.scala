package graft.ops

import org.apache.spark.sql.Dataset

/** Generic uniform-grid linear resample of a keyed 1-D series — the
  * engine-level generalization of the F1 distance resample (SURVEY
  * §2.6) for integer-indexed series (e.g. epoch-microsecond time).
  *
  * Per key: grid points g = x0 + k·step for k = 0..⌊(xn−x0)/step⌋
  * (inclusive of the last point ≤ xn), values linearly interpolated
  * between bracketing samples. Exact grid hits return the sample value;
  * no extrapolation (the grid spans the observed range).
  *
  * Scale: one shuffle on the key; group size = one series. Same
  * properties as the F1 resample — parallelism grows with key count.
  */
object GridResample {

  case class Sample(key: Long, x: Long, seq: Long, y: Double)
  case class GridPoint(key: Long, x: Long, y: Double)

  /** Interpolation kernel for one key's samples (must be non-empty).
    * Duplicate x's keep the smallest `seq` (deterministic keep-first). */
  def resampleSeries(key: Long, samples: Array[Sample], step: Long): Iterator[GridPoint] = {
    val sorted = samples.sortBy(s => (s.x, s.seq))
    val xsB = Array.newBuilder[Long]
    val ysB = Array.newBuilder[Double]
    var lastX = Long.MinValue
    var first = true
    for (s <- sorted) {
      if (first || s.x != lastX) { xsB += s.x; ysB += s.y; lastX = s.x; first = false }
    }
    val xs = xsB.result(); val ys = ysB.result()
    if (xs.isEmpty) return Iterator.empty
    // a key with a single distinct x yields its one grid point (the
    // SQL-oracle's no-next-sample branch does the same), so both sides
    // agree if a scale factor ever produces a single-sample series
    if (xs.length == 1) return Iterator.single(GridPoint(key, xs(0), ys(0)))
    val x0 = xs(0); val xn = xs(xs.length - 1)
    val n = ((xn - x0) / step).toInt + 1
    var j = 0
    Iterator.tabulate(n) { k =>
      val g = x0 + k * step
      while (j < xs.length - 2 && xs(j + 1) <= g) j += 1
      val y =
        if (g >= xn) ys(xs.length - 1)
        else {
          // identical op order to the SQL oracle:
          // y0 + (y1-y0) * (double(g-x0) / double(x1-x0))
          val frac = (g - xs(j)).toDouble / (xs(j + 1) - xs(j)).toDouble
          ys(j) + (ys(j + 1) - ys(j)) * frac
        }
      GridPoint(key, g, y)
    }
  }

  def resample(ds: Dataset[Sample], step: Long): Dataset[GridPoint] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroups((k: Long, it: Iterator[Sample]) =>
        resampleSeries(k, it.toArray, step))
  }
}
