package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention matrix — the product-analytics staple: bucket each
  * user by the period of their FIRST event (the cohort), then for every
  * (cohort, periods-since) cell count how many of that cohort came
  * back. Generalizes the reference's per-season driver-activity
  * rollups (F1_Data_Interactive_Analysis.ipynb era report) to the
  * user-retention shape every events pipeline needs.
  *
  * Scale shape: three keyed shuffles, none global — first-event per
  * user (partial-agg min), distinct (user, period) activity, and the
  * (cohort, offset) rollup whose cardinality is periods², not rows.
  * Retention divides two exact longs once per cell (bit-identical
  * cross-engine), so the gate hash-matches.
  */
object Cohort {

  /** @param events   (userCol, usCol) rows — epoch-micros activity
    * @param periodUs cohort bucket width in micros (e.g. 86_400e6 = day)
    * @return (cohort_period, period_offset, n_active, cohort_size,
    *         retention) — one row per non-empty cell; offset 0 rows
    *         have n_active = cohort_size by construction. */
  def retention(events: DataFrame, userCol: String, usCol: String,
      periodUs: Long): DataFrame = {
    // integer `div`, not `/`: long/long is a DOUBLE divide in Spark SQL
    // and a boundary quotient could round across the bucket edge.
    val withP = events.select(col(userCol).as("_u"),
      expr(s"CAST($usCol AS BIGINT) div ${periodUs}L").as("_p"))
    val firstP = withP.groupBy(col("_u")).agg(min(col("_p")).as("_p0"))
    val sizes = firstP.groupBy(col("_p0")).agg(count(lit(1)).as("cohort_size"))
    withP.distinct()
      .join(firstP, Seq("_u"))
      .groupBy(col("_p0"), (col("_p") - col("_p0")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("_p0"))
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
      .select(col("_p0").as("cohort_period"), col("period_offset"),
        col("n_active"), col("cohort_size"), col("retention"))
  }

  /** DuckDB mirror of [[retention]]. `usSql` must be epoch micros. */
  def retentionSql(srcSql: String, userSql: String, usSql: String,
      periodUs: Long): String =
    s"""WITH src AS (
       |  SELECT $userSql AS u, CAST(($usSql) // $periodUs AS BIGINT) AS p
       |  FROM ($srcSql) raw),
       |first_p AS (SELECT u, MIN(p) AS p0 FROM src GROUP BY 1),
       |sizes AS (SELECT p0, COUNT(*) AS cohort_size FROM first_p GROUP BY 1),
       |cells AS (
       |  SELECT f.p0, s.p - f.p0 AS period_offset,
       |    CAST(COUNT(*) AS BIGINT) AS n_active
       |  FROM (SELECT DISTINCT u, p FROM src) s JOIN first_p f USING (u)
       |  GROUP BY 1, 2)
       |SELECT c.p0 AS cohort_period, c.period_offset, c.n_active,
       |  z.cohort_size,
       |  CAST(c.n_active AS DOUBLE) / CAST(z.cohort_size AS DOUBLE)
       |    AS retention
       |FROM cells c JOIN sizes z USING (p0)""".stripMargin
}
