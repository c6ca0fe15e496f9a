package graft.sim

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003 sign
  * matrix): reduce a d-dim embedding column to k dims with
  * y_j = (1/√k)·Σ_i x_i·s(i,j), s ∈ {±1} — distance-preserving in
  * expectation, and the standard cheap front-end before LSH/IVF
  * indexing when the raw dimension is large.
  *
  * The sign matrix is DERIVED, not stored: s(i,j) = parity of the
  * first hex nibble of md5("rp_i_j"). md5 is identical in the JVM,
  * Spark, and DuckDB, so the projection is reproducible anywhere
  * without shipping matrix state — the property that matters when
  * 1000 executors and an external verifier must agree on the same
  * projection. Per row the work is k·d fused multiply-adds inside one
  * codegen'd `aggregate(zip_with(...))` expression — no shuffle, no
  * UDF, no driver participation.
  *
  * Oracle-exactness: the fold order is fixed (left-to-right) in both
  * engines but float-sum association is engine-internal, so projected
  * values are ROUNDed to 6 dp in gate form — the same tolerance-grid
  * convention as the cosine gates (Knn.scala).
  */
object RandomProjection {

  /** +1/−1 from the md5 parity of "rp_<i>_<j>". */
  private[sim] def sign(i: Int, j: Int): Int = {
    val h = MessageDigest.getInstance("MD5")
      .digest(s"rp_${i}_$j".getBytes(StandardCharsets.UTF_8))
    val nibble = (h(0) >> 4) & 0xf
    if (nibble < 8) 1 else -1
  }

  /** Project `embCol` (array<float/double>, length `d`) to `k` dims.
    * Output columns p0..p(k-1), each rounded to 6 dp. */
  def project(df: DataFrame, embCol: String, d: Int, k: Int): DataFrame = {
    require(k >= 1 && d >= 1)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val projCols = (0 until k).map { j =>
      val signs = (0 until d).map(i => sign(i, j)).mkString("array(", "D, ", "D)")
      round(
        expr(s"""aggregate(
                 |  zip_with(cast($embCol as array<double>), $signs,
                 |    (x, s) -> x * s),
                 |  0D, (acc, x) -> acc + x) * $scale""".stripMargin), 6)
        .as(s"p$j")
    }
    df.select(col("vec_id") +: projCols: _*)
  }

  /** DuckDB mirror of [[project]] — the SAME Scala-derived sign
    * constants are inlined, so both engines share one matrix. */
  def projectSql(srcSql: String, embSql: String, d: Int, k: Int): String = {
    val scale = 1.0 / math.sqrt(k.toDouble)
    val cols = (0 until k).map { j =>
      val signs = (0 until d).map(i => s"${sign(i, j)}.0").mkString("[", ", ", "]")
      s"""ROUND(list_sum(list_transform(generate_series(1, $d),
         |    i -> e[i] * ($signs)[i])) * $scale, 6) AS p$j""".stripMargin
    }
    s"""WITH src AS ($srcSql),
       |e0 AS (SELECT vec_id, CAST($embSql AS DOUBLE[]) AS e FROM src)
       |SELECT vec_id,
       |${cols.mkString(",\n")}
       |FROM e0""".stripMargin
  }
}
