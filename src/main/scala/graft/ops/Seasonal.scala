package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDsl.{dsum, dsumSql}

/** Classical seasonal decomposition + anomaly flags over keyed series —
  * telemetry's "is this spike the usual 9am surge or a real incident?"
  * question, answered additively: y = trend + seasonal + residual,
  * anomaly ⇔ |residual| > k·σ(residual).
  *
  *  - trend: centered moving average over one season (row frame —
  *    documented as over OBSERVED buckets; gap-fill upstream with
  *    TimeGrid when calendar alignment matters),
  *  - seasonal: per-(series, phase) mean of the detrended values,
  *  - residual z-scores from the decimal-exact residual moments.
  *
  * Scale shape: the corpus collapses to (series, bucket) in one
  * aggregate; everything after runs on the bucket table — two keyed
  * windows on ONE (series) shuffle, one phase-mean aggregate joined
  * back, one moments aggregate joined back. Nothing touches raw rows
  * twice, no global window anywhere.
  *
  * Oracle-exactness: every aggregate (bucket sums, windowed trend
  * sums/counts, phase means, residual moments) folds as decimal(38,6)
  * — order-immune; the per-row arithmetic chain (y−trend−seasonal,
  * σ via (nΣr²−(Σr)²)/n², the k·σ compare) is a fixed IEEE op
  * sequence on identical operands → hash-identical cross-engine.
  */
object Seasonal {

  /** Decompose per-series bucket sums of `valCol`.
    *
    * @param bucketUs   bucket width in micros (the resolution)
    * @param period     season length in buckets (e.g. 24 for daily
    *                   seasonality over hourly buckets)
    * @param sigmaK     anomaly threshold in residual sigmas
    * @return (series, bucket, phase, y, trend, seasonal, resid,
    *         is_anomaly) */
  def decompose(df: DataFrame, seriesCol: String, tUsCol: String,
      valCol: String, bucketUs: Long, period: Int,
      sigmaK: Double = 3.0): DataFrame = {
    require(period >= 2)
    val half = period / 2
    val buckets = df
      .select(col(seriesCol).as("series"),
        // floor division (matches DuckDB `//` for pre-epoch timestamps)
        expr(s"(CAST($tUsCol AS BIGINT) - pmod(CAST($tUsCol AS BIGINT), $bucketUs)) div $bucketUs")
          .as("bucket"),
        col(valCol).as("_v"))
      .groupBy(col("series"), col("bucket"))
      .agg(dsum(col("_v")).as("y"))
      .withColumn("phase", pmod(col("bucket"), lit(period.toLong)))
      // series×bucket bounded — every downstream stage (trend window,
      // phase means, residual moments, final join) re-derives from
      // this compaction, so pin it once (scan census: 4 → 1 corpus
      // scans; the re-run windows over the tiny frame are cheap)
      .localCheckpoint(true)

    // centered moving average over one season of OBSERVED buckets
    val wTrend = Window.partitionBy(col("series")).orderBy(col("bucket"))
      .rowsBetween(-half, period - half - 1)
    val dec = "decimal(38,6)"
    val trended = buckets.withColumn("trend",
      (sum(col("y").cast(dec)).over(wTrend).cast("double")) /
        count(lit(1)).over(wTrend))

    // per-(series, phase) mean of detrended values
    val phaseMeans = trended
      .groupBy(col("series"), col("phase"))
      .agg((dsum(col("y") - col("trend")) /
        count(lit(1))).as("seasonal"))
    val withSeasonal = trended
      .join(phaseMeans, Seq("series", "phase"))
      .withColumn("resid", col("y") - col("trend") - col("seasonal"))

    // residual sigma per series: population σ² = (nΣr² − (Σr)²)/n²
    val moments = withSeasonal.groupBy(col("series"))
      .agg(count(lit(1)).as("_n"), dsum(col("resid")).as("_sr"),
        dsum(col("resid") * col("resid")).as("_sr2"))
      .withColumn("_sigma", sqrt(
        (col("_n") * col("_sr2") - col("_sr") * col("_sr")) /
          (col("_n") * col("_n")).cast("double")))
      .select(col("series"), col("_sigma"))

    withSeasonal
      .join(broadcast(moments), Seq("series"))
      .withColumn("is_anomaly", abs(col("resid")) > lit(sigmaK) * col("_sigma"))
      .select(col("series"), col("bucket"), col("phase"), col("y"),
        col("trend"), col("seasonal"), col("resid"), col("is_anomaly"))
  }

  /** DuckDB mirror of [[decompose]]. */
  def decomposeSql(srcSql: String, seriesSql: String, tUsSql: String,
      valSql: String, bucketUs: Long, period: Int,
      sigmaK: Double = 3.0): String = {
    val half = period / 2
    s"""WITH src AS ($srcSql),
       |b AS (
       |  SELECT $seriesSql AS series, CAST($tUsSql AS BIGINT) // $bucketUs AS bucket,
       |    ${dsumSql(valSql)} AS y
       |  FROM src GROUP BY 1, 2),
       |ph AS (SELECT *, ((bucket % $period) + $period) % $period AS phase FROM b),
       |tr AS (
       |  SELECT *,
       |    CAST(SUM(CAST(y AS DECIMAL(38,6))) OVER w AS DOUBLE)
       |      / COUNT(*) OVER w AS trend
       |  FROM ph
       |  WINDOW w AS (PARTITION BY series ORDER BY bucket
       |    ROWS BETWEEN $half PRECEDING AND ${period - half - 1} FOLLOWING)),
       |pm AS (
       |  SELECT series, phase,
       |    ${dsumSql("y - trend")} / COUNT(*) AS seasonal
       |  FROM tr GROUP BY 1, 2),
       |ws AS (
       |  SELECT tr.*, pm.seasonal, tr.y - tr.trend - pm.seasonal AS resid
       |  FROM tr JOIN pm USING (series, phase)),
       |mo AS (
       |  SELECT series, COUNT(*) AS n, ${dsumSql("resid")} AS sr,
       |    ${dsumSql("resid * resid")} AS sr2
       |  FROM ws GROUP BY 1),
       |sg AS (
       |  SELECT series,
       |    sqrt((n * sr2 - sr * sr) / CAST(n * n AS DOUBLE)) AS sigma
       |  FROM mo)
       |SELECT ws.series, bucket, phase, y, trend, seasonal, resid,
       |  abs(resid) > $sigmaK * sigma AS is_anomaly
       |FROM ws JOIN sg ON ws.series = sg.series""".stripMargin
  }
}
