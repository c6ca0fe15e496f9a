package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling active-user engagement: per calendar period, DAU, trailing
  * W-period WAU, and the DAU/WAU stickiness ratio — the daily
  * engagement dashboard over an events stream.
  *
  * Scale shape: the corpus compacts to DISTINCT (period, user) in one
  * shuffle; the trailing window is an explode of ≤W integer offsets on
  * that compacted frame (rows × W, not corpus × W) followed by a
  * second distinct — the standard sliding-distinct-count rewrite that
  * avoids both a self-join per window position and any per-user state.
  * Output cardinality is #periods.
  *
  * Exactness: pure long counts; stickiness is one IEEE divide.
  */
object ActiveUsers {

  /** @param periodUs bucket width in micros (86_400e6 = day)
    * @param w        trailing window length in periods (7 = weekly)
    * @return (period, dau, wau, stickiness) for periods with activity. */
  def stickiness(events: DataFrame, userCol: String, usCol: String,
      periodUs: Long, w: Int): DataFrame = {
    require(w >= 1)
    val pu = events.select(col(userCol).as("_u"),
        expr(s"CAST($usCol AS BIGINT) div ${periodUs}L").as("_p"))
      .distinct()
    val dau = pu.groupBy(col("_p").as("period"))
      .agg(count(lit(1)).as("dau"))
    val wau = pu
      .select(col("_u"), explode(sequence(lit(0), lit(w - 1))).as("_off"),
        col("_p"))
      .select(col("_u"), (col("_p") + col("_off")).as("_wend"))
      .distinct()
      .groupBy(col("_wend").as("period"))
      .agg(count(lit(1)).as("wau"))
    // inner join: only periods that really had activity (a _wend past
    // the last active period is a phantom row the dashboard never shows)
    dau.join(wau, Seq("period"))
      .withColumn("stickiness",
        col("dau").cast("double") / col("wau").cast("double"))
  }

  /** DuckDB mirror of [[stickiness]]. */
  def stickinessSql(srcSql: String, userSql: String, usSql: String,
      periodUs: Long, w: Int): String =
    s"""WITH pu AS (
       |  SELECT DISTINCT $userSql AS u,
       |    CAST(($usSql) // $periodUs AS BIGINT) AS p
       |  FROM ($srcSql) raw),
       |dau AS (SELECT p AS period, CAST(COUNT(*) AS BIGINT) AS dau
       |  FROM pu GROUP BY 1),
       |wau AS (
       |  SELECT wend AS period, CAST(COUNT(*) AS BIGINT) AS wau FROM (
       |    SELECT DISTINCT u, p + off.i AS wend
       |    FROM pu, (SELECT unnest(generate_series(0, ${w - 1})) AS i) off)
       |  GROUP BY 1)
       |SELECT period, dau.dau, wau.wau,
       |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
       |FROM dau JOIN wau USING (period)""".stripMargin
}
