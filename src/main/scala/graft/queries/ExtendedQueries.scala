package graft.queries

import org.apache.spark.sql.functions._
import QueryDsl._

/** Breadth operators beyond the reference's own surface — multi-level
  * grouping (rollup/cube), bag set-ops, and pivot — each with a DuckDB
  * oracle, so a reference user gains them "for free" with the same
  * correctness guarantee (SURVEY §2.4/§2.7 "free via Spark" notes).
  */
object ExtendedQueries {

  /** ROLLUP over (year, priority): per-group, per-year subtotal, grand
    * total. Grouping nulls follow the SQL standard in both engines. */
  private val rollupQ: Q = (s, d) =>
    table(s, d, "orders")
      .withColumn("yr", year(col("o_orderdate")).cast("int"))
      .rollup(col("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  private val rollupSql =
    s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority,
       |COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY ROLLUP(1, 2)""".stripMargin

  /** CUBE over (returnflag, linestatus). */
  private val cubeQ: Q = (s, d) =>
    table(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))

  private val cubeSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY CUBE(1, 2)""".stripMargin

  /** EXCEPT ALL — bag difference preserving multiplicity. */
  private val exceptAllQ: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    li.filter(year(col("l_shipdate")) === 1997).select(col("l_suppkey"))
      .exceptAll(li.filter(year(col("l_shipdate")) === 1998).select(col("l_suppkey")))
  }

  private val exceptAllSql =
    """SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1997
      |EXCEPT ALL
      |SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1998""".stripMargin

  /** INTERSECT ALL — bag intersection. */
  private val intersectAllQ: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    li.filter(year(col("l_shipdate")) === 1997).select(col("l_suppkey"))
      .intersectAll(li.filter(year(col("l_shipdate")) === 1998).select(col("l_suppkey")))
  }

  private val intersectAllSql =
    """SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1997
      |INTERSECT ALL
      |SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1998""".stripMargin

  /** Pivot: per-user event counts spread across event-type columns. */
  private val pivotQ: Q = (s, d) =>
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))

  private val pivotSql =
    """SELECT user_id,
      |CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
      |CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view,
      |CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
      |CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
      |CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error
      |FROM events GROUP BY user_id""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("rollup_year_prio", rollupQ, Some(rollupSql)),
    ("cube_flags", cubeQ, Some(cubeSql)),
    ("except_all", exceptAllQ, Some(exceptAllSql)),
    ("intersect_all", intersectAllQ, Some(intersectAllSql)),
    ("pivot_event_counts", pivotQ, Some(pivotSql))
  )
}
