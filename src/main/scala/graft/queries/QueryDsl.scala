package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the DuckDB-oracle query registry.
  *
  * Design notes for oracle exactness:
  *  - Sums/avgs of arbitrary doubles are NOT reproducible across engines
  *    (summation order differs), so money/value aggregates go through an
  *    exact decimal cast: `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  *    Decimal addition is associative → bit-identical results, and the
  *    final cast to double is deterministic.
  *  - events.ts is nanosecond parquet; Spark 4 only reads it via
  *    spark.sql.legacy.parquet.nanosAsLong → LongType nanos. We derive
  *    `ev_us = ts div 1000` (micros, floor) which equals DuckDB's
  *    `epoch_us(CAST(ts AS TIMESTAMP))` (ns→us cast truncates).
  *  - Every window is ordered by a unique key chain (no ties), every
  *    top-k has a deterministic tiebreak, `first()` is never used.
  */
object QueryDsl {
  /** A declared query: Spark side + (optional) DuckDB oracle SQL. */
  type Q = (SparkSession, String) => DataFrame

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` exposed as `ev_us` (epoch micros) and `ev_ts`
    * (session-UTC timestamp, micros precision), regardless of how the
    * parquet writer encoded the column:
    *  - int64 nanos (read as LongType via nanosAsLong) → `ts div 1000`
    *  - timestamp[us] without tz (TIMESTAMP_NTZ) → microsecond delta from
    *    the NTZ epoch (naive wall-clock treated as UTC, matching DuckDB's
    *    `epoch_us(ts)`; tz-independent so any session timezone works)
    *  - timestamp[us] with tz (TIMESTAMP) → `unix_micros(ts)` */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // runtime SQL conf: robust even if the calling session's builder
    // didn't set it (e.g. the driver's own session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val evUs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _: TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case _ => unix_micros(col("ts"))
    }
    raw.withColumn("ev_us", evUs)
      .withColumn("ev_ts", timestamp_micros(col("ev_us")))
  }

  /** Exact distributed sum of a double column: associative decimal
    * accumulation, final deterministic cast back to double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  /** Exact average (decimal sum / count, division done in double). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** DuckDB spelling of [[dsum]]. */
  def dsumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)"
  def davgSql(x: String): String = s"${dsumSql(x)} / COUNT(*)"

  /** DuckDB spelling of `ev_us`. */
  val evUsSql = "epoch_us(CAST(ts AS TIMESTAMP))"
}
