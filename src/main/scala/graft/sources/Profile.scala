package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the data-quality audit a pipeline
  * runs before trusting a new 100 TB drop: per column, row count, null
  * count, distinct cardinality, and min/max (rendered as strings so
  * one result schema fits every column type).
  *
  * Plan shape: ONE aggregation over ONE scan produces every statistic
  * (the multiple COUNT(DISTINCT)s plan through Spark's Expand — still
  * a single pass over the data), then the 1×(4·cols) row pivots to
  * cols×4 via an in-memory explode of a literal-built array. Nothing
  * driver-side touches data rows.
  *
  * Determinism/oracle: counts are exact; min/max are rendered from
  * string/integer/date columns only in the gate (double→string
  * rendering differs across engines — callers profiling double
  * columns should round first).
  */
object Profile {

  /** Profile `cols` of `df`: (col_name, n_rows, n_nulls, n_distinct,
    * min_v, max_v). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"dst_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val perCol = array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"dst_$c").as("n_distinct"),
        col(s"min_$c").as("min_v"),
        col(s"max_$c").as("max_v"))
    }: _*)
    one.select(explode(perCol).as("p")).select("p.*")
  }

  /** DuckDB oracle for [[profile]] over the same columns. */
  def profileSql(tableName: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |CAST(MIN($c) AS VARCHAR) AS min_v, CAST(MAX($c) AS VARCHAR) AS max_v
         |FROM $tableName""".stripMargin
    }.mkString("\nUNION ALL\n")
}
