package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.sim.Covariance.CovSumsAgg

/** Distributed PCA over the embedding column — the standard
  * decorrelation / compaction front-end for the ANN stack (whitening
  * before PQ, plotting corpora in 2-D, variance auditing after an
  * encoder change).
  *
  * Shape: ONE pass over the corpus folds the exact integer-quantized
  * covariance sufficient statistics ([[graft.sim.Covariance.CovSumsAgg]]
  * — 1e-6-unit longs, mergeable, partition-order-immune), the d×d
  * eigenproblem is solved on the DRIVER (d ≤ a few hundred → the matrix
  * is a bounded artifact like a k-means codebook, NOT data), and the
  * projection is a broadcast matmul fused into per-row codegen'd
  * `aggregate(zip_with(...))` expressions. The corpus is never
  * shuffled; the only aggregate is d(d+3)/2 longs per partition.
  *
  * Determinism: quantized sums are EXACT, so the covariance matrix is
  * bit-identical for any partitioning; the driver eigensolve (power
  * iteration + deflation, fixed start vector and iteration count, sign
  * fixed by the largest-loading convention) is then a pure function —
  * the whole fit is reproducible across cluster layouts, which is what
  * makes the model reviewable. No SQL oracle (eigensolve has no DuckDB
  * spelling — same class as the ANN gates); PcaSpec anchors known-
  * direction recovery, orthogonality, ordering, and partitioning
  * invariance.
  *
  * Quantization range: |v|·1e6 and pairwise products must fit a long —
  * fine for unit-scale embeddings up to ~10¹⁰ rows per fit (the
  * Covariance.scala bound); rescale upstream for wider values.
  */
object Pca {

  /** Fitted model: per (component, dim) loading + per-component
    * eigenvalue and explained-variance ratio. */
  case class PcaModel(d: Int, n: Long, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double],
      totalVar: Double)

  /** One-pass exact covariance fold + driver eigensolve. */
  def fit(emb: Dataset[Array[Float]], k: Int, iters: Int = 200): PcaModel = {
    val buf = emb.select(CovSumsAgg.toColumn).head()
    val d = buf.d
    require(d > 0, "empty input")
    require(k >= 1 && k <= d)
    val n = buf.n.toDouble
    val q = 1e6
    val mean = Array.tabulate(d)(i => buf.sums(i) / (n * q))
    // cov(i,j) = (S_ij - S_i*S_j/n) / (n * q^2)   (population)
    val cov = Array.ofDim[Double](d, d)
    var kk = d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val sij = buf.sums(kk).toDouble
        val c = (sij - buf.sums(i).toDouble * buf.sums(j) / n) / (n * q * q)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; kk += 1
      }
      i += 1
    }
    val totalVar = (0 until d).map(i => cov(i)(i)).sum

    // power iteration with deflation — deterministic start + sign fix
    val comps = Array.ofDim[Double](k, d)
    val eigs = new Array[Double](k)
    val a = cov.map(_.clone())
    var c = 0
    while (c < k) {
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val av = Array.tabulate(d) { r =>
          var s = 0.0; var j = 0
          while (j < d) { s += a(r)(j) * v(j); j += 1 }; s
        }
        val nrm = math.sqrt(av.map(x => x * x).sum)
        v = if (nrm > 0) av.map(_ / nrm)
        else Array.tabulate(d)(i => if (i == c % d) 1.0 else 0.0) // degenerate
        it += 1
      }
      val av = Array.tabulate(d) { r =>
        var s = 0.0; var j = 0
        while (j < d) { s += a(r)(j) * v(j); j += 1 }; s
      }
      val lam = v.zip(av).map { case (x, y) => x * y }.sum
      // sign convention: largest |loading| is positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val sv = if (v(m) < 0) v.map(-_) else v
      comps(c) = sv; eigs(c) = lam
      // deflate: A -= λ v vᵀ
      var r = 0
      while (r < d) {
        var j = 0
        while (j < d) { a(r)(j) -= lam * sv(r) * sv(j); j += 1 }
        r += 1
      }
      c += 1
    }
    PcaModel(d, buf.n, mean, comps, eigs, totalVar)
  }

  /** Model as a frame: (component, dim, loading, eigenvalue,
    * explained_ratio) — the shipped artifact. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession,
      m: PcaModel): DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- m.components.indices
      i <- 0 until m.d
    } yield (c, i, m.components(c)(i), m.eigenvalues(c),
      if (m.totalVar > 0) m.eigenvalues(c) / m.totalVar else 0.0)
    rows.toDF("component", "dim", "loading", "eigenvalue",
      "explained_ratio")
  }

  /** Project: pc_c = Σ_i (x_i − mean_i)·w_ci, fused per-row codegen
    * (the model is inlined as literal arrays — bounded artifact). */
  def project(df: DataFrame, embCol: String, m: PcaModel): DataFrame = {
    def arr(xs: Array[Double]) = xs.mkString("array(", "D, ", "D)")
    val meanLit = arr(m.mean)
    val cols = m.components.zipWithIndex.map { case (w, c) =>
      expr(s"""aggregate(
               |  zip_with(
               |    zip_with(cast($embCol as array<double>), $meanLit,
               |      (x, mu) -> x - mu),
               |    ${arr(w)}, (xc, w) -> xc * w),
               |  0D, (acc, x) -> acc + x)""".stripMargin).as(s"pc$c")
    }
    df.select(col("vec_id") +: cols.toSeq: _*)
  }
}
