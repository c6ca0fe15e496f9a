package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OHLC (open/high/low/close) time-bucket downsampling — the standard
  * lossy resample for telemetry and market-style series: per (key,
  * bucket) keep the first, max, min, and last value plus the sample
  * count. The reference's dashboards plot decimated telemetry lines
  * (F1_web_dashboard_app.py's lap traces); OHLC is the
  * order-preserving generalization a 100 TB series store actually
  * ships, because it reduces arbitrarily dense series to a fixed
  * per-bucket footprint without losing the envelope.
  *
  * Scale shape: ONE shuffle on (key, bucket) — open/close ride the
  * same hash aggregate as high/low via `min_by`/`max_by` over a
  * (ts, tiebreak) struct, so there is no window, no sort, and no
  * second Exchange. Struct ordering is lexicographic in both engines;
  * `tieCol` must make the ordering total (a unique id) so first/last
  * are deterministic. All four outputs are SELECTIONS of stored
  * doubles (no arithmetic) → bit-exact across engines.
  */
object Ohlc {

  /** @param df       input frame
    * @param keyCols  series identity (e.g. user/driver/sensor id)
    * @param tsCol    event-time column, integer-like (e.g. micros)
    * @param tieCol   unique tie-break column (total order within key)
    * @param valCol   the measured value
    * @param bucketWidth bucket size in `tsCol` units
    * @return keyCols + bucket_start + open/high/low/close + n_samples */
  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, valCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    // integer-exact bucket floor (ts - ts mod width): epoch-micros
    // magnitudes would lose exactness in a double division
    val tsL = col(tsCol).cast("long")
    val bucket = tsL - pmod(tsL, lit(bucketWidth))
    val ord: Column = struct(col(tsCol), col(tieCol))
    df.withColumn("bucket_start", bucket)
      .groupBy((keyCols.map(col) :+ col("bucket_start")): _*)
      .agg(
        min_by(col(valCol), ord).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), ord).as("close"),
        count(lit(1)).as("n_samples"))
  }

  /** DuckDB oracle: same bucketing; open/close via row_number windows
    * (ascending / descending over the identical (ts, tie) order) —
    * the declarative mirror of min_by/max_by on the ordering struct. */
  def resampleSql(srcSql: String, keys: Seq[String], tsSql: String,
      tieSql: String, valSql: String, bucketWidth: Long): String = {
    val ks = keys.mkString(", ")
    s"""WITH src AS ($srcSql),
       |b AS (
       |  SELECT $ks, $tsSql - ($tsSql % $bucketWidth) AS bucket_start,
       |    $valSql AS v,
       |    row_number() OVER (PARTITION BY $ks, $tsSql - ($tsSql % $bucketWidth)
       |      ORDER BY $tsSql ASC, $tieSql ASC) AS rn_a,
       |    row_number() OVER (PARTITION BY $ks, $tsSql - ($tsSql % $bucketWidth)
       |      ORDER BY $tsSql DESC, $tieSql DESC) AS rn_d
       |  FROM src)
       |SELECT $ks, bucket_start,
       |  max(CASE WHEN rn_a = 1 THEN v END) AS open,
       |  max(v) AS high, min(v) AS low,
       |  max(CASE WHEN rn_d = 1 THEN v END) AS close,
       |  CAST(count(*) AS BIGINT) AS n_samples
       |FROM b GROUP BY $ks, bucket_start""".stripMargin
  }
}
