package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization — replace each value by the CORPUS-global
  * value at the same quantile position within its group, forcing every
  * group onto one reference distribution (the cross-batch/feature
  * comparability transform; genomics' quantile-norm, features'
  * "rank-gauss" cousin with the empirical global reference).
  *
  * Row with within-group rank r of n maps to the global order
  * statistic at index ceil(r·N/n) — pure integer math:
  * j = (r·N + n − 1) div n, so the gate is exact with NO float
  * tolerance at all; the mapped value is an actual input value.
  *
  * Scale shape: the global order statistics come from
  * [[GlobalRank]] (range buckets — never a single-partition window);
  * the group rank is a keyed window; the index lookup is a keyed equi
  * join on j. Three shuffles, all on natural keys.
  */
object QuantileNorm {

  /** @param idCol globally unique (rank tiebreak + row identity)
    * @return input rows + (grp_rank, grp_n, norm_value). */
  def toGlobalReference(input: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    // the plan reads the input THREE ways (global rank, corpus count,
    // the group-rank chain) — materialize it once so an expensive
    // upstream lineage never re-executes (scan-censused 6 source
    // scans without this); callers should project to the lean frame
    // first since all carried columns are pinned
    val df = input.localCheckpoint(true)
    val ranked = GlobalRank.withGlobalRank(
      df.select(col(valueCol), col(idCol)), valueCol, idCol, "_grank",
      materialize = false)
    val ref = ranked.select(col("_grank").as("_j"),
      col(valueCol).as("norm_value"))
    val totals = df.agg(count(lit(1)).as("_n_total"))
    val wGrp = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    df.crossJoin(broadcast(totals)) // 1-row corpus count
      .withColumn("grp_rank", row_number().over(wGrp).cast("long"))
      .withColumn("grp_n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("_j",
        expr("(grp_rank * _n_total + grp_n - 1) div grp_n"))
      .join(ref, Seq("_j"))
      .drop("_j", "_n_total")
  }

  /** DuckDB mirror (plain global window — GlobalRank's luxury). */
  def toGlobalReferenceSql(srcSql: String, groupSql: String,
      valueSql: String, idSql: String, outCols: String): String =
    s"""WITH src AS ($srcSql),
       |ref AS (
       |  SELECT row_number() OVER (ORDER BY $valueSql, $idSql) AS j,
       |    $valueSql AS norm_value
       |  FROM src),
       |t AS (SELECT COUNT(*) AS n_total FROM src),
       |g AS (
       |  SELECT src.*,
       |    row_number() OVER (PARTITION BY $groupSql
       |      ORDER BY $valueSql, $idSql) AS grp_rank,
       |    COUNT(*) OVER (PARTITION BY $groupSql) AS grp_n
       |  FROM src)
       |SELECT $outCols, g.grp_rank, g.grp_n, ref.norm_value
       |FROM g CROSS JOIN t
       |JOIN ref ON ref.j = (g.grp_rank * t.n_total + g.grp_n - 1) // g.grp_n""".stripMargin
}
