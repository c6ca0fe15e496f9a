package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDsl.{dsum, dsumSql}

/** Largest-Triangle-Three-Buckets-style telemetry downsampling,
  * distributed per series.
  *
  * The reference plots full-resolution telemetry traces
  * (F1_web_dashboard_app.py speed/throttle charts,
  * F1-25_analyze_my_session.py:60-75) — at 100 TB a dashboard cannot
  * ship billions of points to a browser; the standard reducer is LTTB
  * (Steinarsson 2013): one representative point per time bucket, chosen
  * to maximize the triangle area against the neighbor buckets, which
  * preserves visual extremes far better than plain averaging.
  *
  * This is the parallel variant: the triangle anchors are the PREVIOUS
  * and NEXT bucket AVERAGES (classic LTTB anchors the previously chosen
  * point, a sequential dependency; anchoring the neighbor average — the
  * original paper's "LTTB with fixed anchors" simplification — makes
  * every bucket independent). First/last buckets of a series keep their
  * first/last point, preserving the trace endpoints.
  *
  * Scale shape: one groupBy to (series, bucket) summaries, one keyed
  * lag/lead window over summaries (rows = buckets, not points), one
  * hash join back to points on (series, bucket), one keyed row_number.
  * Nothing global, nothing driver-side.
  *
  * Oracle-exactness: bucket ids are FLOOR division (matching DuckDB's
  * `//`, including for negative/pre-epoch timestamps); bucket averages are
  * decimal-exact sums with one IEEE divide; the area form
  * |(tₚ−tₙ)(y−yₚ) − (tₚ−t)(yₙ−yₚ)| is per-row IEEE arithmetic on
  * identical operands — bit-equal across engines — and the argmax is
  * made total by the (t, key) tiebreak.
  */
object Lttb {

  /** Downsample to one point per `bucketWidth` of `tCol` per series.
    *
    * @param keyCol unique row id (total tiebreak)
    * @return (series, bucket, t, y) of the chosen representatives */
  def downsample(df: DataFrame, seriesCol: String, tCol: String,
      yCol: String, keyCol: String, bucketWidth: Long): DataFrame = {
    val pts = df.select(
      col(seriesCol).as("series"),
      col(tCol).cast("long").as("t"),
      col(yCol).cast("double").as("y"),
      col(keyCol).as("k"),
      // floor division (not `div`, which truncates toward zero) so
      // pre-epoch timestamps bucket identically to the DuckDB `//`
      // mirror: (t - pmod(t, w)) is always the floor multiple.
      expr(s"(CAST($tCol AS BIGINT) - pmod(CAST($tCol AS BIGINT), $bucketWidth)) div $bucketWidth")
        .as("bucket"))

    val wS = Window.partitionBy(col("series")).orderBy(col("bucket"))
    val summaries = pts
      .groupBy(col("series"), col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("t")).as("st"),
        dsum(col("y")).as("sy"))
      .withColumn("avg_t", col("st") / col("n"))
      .withColumn("avg_y", col("sy") / col("n"))
      .select(col("series"), col("bucket"),
        lag(col("avg_t"), 1).over(wS).as("tp"),
        lag(col("avg_y"), 1).over(wS).as("yp"),
        lead(col("avg_t"), 1).over(wS).as("tn"),
        lead(col("avg_y"), 1).over(wS).as("yn"))

    val joined = pts.join(summaries, Seq("series", "bucket"))
      .withColumn("score",
        when(col("tp").isNull, -col("t").cast("double"))  // first: min t
          .when(col("tn").isNull, col("t").cast("double")) // last: max t
          .otherwise(abs(
            (col("tp") - col("tn")) * (col("y") - col("yp")) -
              (col("tp") - col("t")) * (col("yn") - col("yp")))))
    val wPick = Window.partitionBy(col("series"), col("bucket"))
      .orderBy(col("score").desc, col("t"), col("k"))
    joined
      .withColumn("_rn", row_number().over(wPick))
      .filter(col("_rn") === 1)
      .select(col("series"), col("bucket"), col("t"), col("y"))
  }

  /** DuckDB mirror of [[downsample]]. */
  def downsampleSql(srcSql: String, seriesSql: String, tSql: String,
      ySql: String, keySql: String, bucketWidth: Long): String =
    s"""WITH src AS ($srcSql),
       |pts AS (
       |  SELECT $seriesSql AS series, CAST($tSql AS BIGINT) AS t,
       |    CAST($ySql AS DOUBLE) AS y, $keySql AS k,
       |    CAST($tSql AS BIGINT) // $bucketWidth AS bucket
       |  FROM src),
       |summ AS (
       |  SELECT series, bucket, COUNT(*) AS n,
       |    ${dsumSql("t")} AS st, ${dsumSql("y")} AS sy
       |  FROM pts GROUP BY 1, 2),
       |nbr AS (
       |  SELECT series, bucket,
       |    lag(st / n) OVER w AS tp, lag(sy / n) OVER w AS yp,
       |    lead(st / n) OVER w AS tn, lead(sy / n) OVER w AS yn
       |  FROM summ WINDOW w AS (PARTITION BY series ORDER BY bucket)),
       |scored AS (
       |  SELECT p.series, p.bucket, p.t, p.y, p.k,
       |    CASE WHEN b.tp IS NULL THEN -CAST(p.t AS DOUBLE)
       |         WHEN b.tn IS NULL THEN CAST(p.t AS DOUBLE)
       |         ELSE ABS((b.tp - b.tn) * (p.y - b.yp)
       |                  - (b.tp - p.t) * (b.yn - b.yp)) END AS score
       |  FROM pts p JOIN nbr b USING (series, bucket)),
       |picked AS (
       |  SELECT *, row_number() OVER (PARTITION BY series, bucket
       |    ORDER BY score DESC, t, k) AS rn
       |  FROM scored)
       |SELECT series, bucket, t, y FROM picked WHERE rn = 1""".stripMargin
}
