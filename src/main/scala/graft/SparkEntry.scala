package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._
import graft.queries.QueryDsl.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full operator-inventory query registry. Each registry
  * object contributes (name, sparkQuery, Option[duckdbOracleSql]) triples;
  * queries without oracle SQL get the driver's weaker rows-only check.
  */
object SparkEntry {

  private def registry: Seq[(String, Q, Option[String])] =
    RelationalQueries.entries ++ ResampleQueries.entries ++
      DocQueries.entries ++ AsofQueries.entries ++ ExtendedQueries.entries ++
      MultimodalQueries.entries ++ F1GateQueries.entries ++
      MlQueries.entries ++ WarehouseGateQueries.entries ++
      CodecQueries.entries ++ CorpusOpsQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Avoids the events table so it works on any session config (events
    * needs the nanosAsLong flag). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val sup = broadcast(spark.read.parquet(s"$d/supplier.parquet"))
    val nat = broadcast(spark.read.parquet(s"$d/nation.parquet"))
    val reg = broadcast(spark.read.parquet(s"$d/region.parquet"))
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .join(reg, nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q, _) => name -> q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
