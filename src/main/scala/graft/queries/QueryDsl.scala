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

  /** events with nanosecond ts exposed as `ev_us` (epoch micros) and
    * `ev_ts` (session-UTC timestamp, micros precision). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // runtime SQL conf: robust even if the calling session's builder
    // didn't set it (e.g. the driver's own session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ev_us", expr("ts div 1000"))
      .withColumn("ev_ts", timestamp_micros(expr("ts div 1000")))
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
