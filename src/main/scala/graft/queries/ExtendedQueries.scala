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

  /** UNPIVOT — the inverse surface: melt the pivoted per-user counts
    * back to long form (wide sensor/metric tables arrive constantly;
    * melting them is how they enter a long-form warehouse). Zero
    * cells survive the round trip, so pivot ∘ unpivot is lossless. */
  private val unpivotTypes = Seq("click", "view", "purchase", "signup", "error")
  private val unpivotQ: Q = (s, d) =>
    pivotQ(s, d).unpivot(
      Array(col("user_id")), unpivotTypes.map(col).toArray, "event_type", "n")

  private val unpivotSql =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |t(event_type) AS (VALUES ${unpivotTypes.map(t => s"('$t')").mkString(", ")}),
       |c AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT u.user_id, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
       |FROM u CROSS JOIN t
       |LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type""".stripMargin

  /** Explicit GROUPING SETS (beyond rollup/cube's fixed lattices) with
    * GROUPING() markers to disambiguate real NULLs from subtotal rows. */
  private val groupingSetsQ: Q = (s, d) =>
    table(s, d, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"))

  private val groupingSetsSql =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin

  /** The ranking-function suite over one window (rank / dense_rank /
    * percent_rank / ntile). The ordering carries a unique tie-break
    * (c_custkey) so every function is deterministic cross-engine;
    * percent_rank's (rank−1)/(n−1) is per-row double math, which
    * matches bit-for-bit. */
  private val rankSuiteQ: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    table(s, d, "customer")
      .select(col("c_nationkey"), col("c_custkey"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        percent_rank().over(w).as("prk"),
        ntile(4).over(w).as("quartile"))
  }

  private val rankSuiteSql =
    """SELECT c_nationkey, c_custkey,
      |  CAST(rank() OVER w AS BIGINT) AS rk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
      |  percent_rank() OVER w AS prk,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  /** P15 (array scalars, "free from Spark"): build a sorted distinct
    * array per group, then element access / size / membership — the
    * construct-and-consume array lifecycle under the oracle. */
  private val arrayOpsQ: Q = (s, d) =>
    table(s, d, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sort_array(collect_set(col("o_orderpriority"))).as("l"))
      .select(col("c_custkey"), size(col("l")).as("n_prios"),
        element_at(col("l"), 1).as("first_prio"),
        element_at(col("l"), -1).as("last_prio"),
        array_contains(col("l"), "1-URGENT").cast("int").as("has_urgent"))

  private val arrayOpsSql =
    """SELECT c_custkey, CAST(len(l) AS INT) AS n_prios, l[1] AS first_prio,
      |       l[-1] AS last_prio,
      |       CAST(list_contains(l, '1-URGENT') AS INT) AS has_urgent
      |FROM (SELECT o_custkey AS c_custkey,
      |             list(DISTINCT o_orderpriority ORDER BY o_orderpriority) AS l
      |      FROM orders GROUP BY 1) t""".stripMargin

  /** P15 (JSON scalars): path extraction from the events props column
    * + typed aggregation — get_json_object stays codegen'd, no UDF. */
  private val jsonOpsQ: Q = (s, d) =>
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))

  private val jsonOpsSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1""".stripMargin

  /** Binned range join (ops.RangeJoin): orders landing inside each
    * sampled lineitem's 30-day post-ship window — an equi-join on
    * 32-day bins + exact filter, never a nested-loop plan. */
  private val rangeJoinQ: Q = (s, d) => {
    val points = table(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val intervals = table(s, d, "lineitem")
      .filter(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        expr("timestampadd(DAY, 30, l_shipdate)").as("l_shipend"))
    graft.ops.RangeJoin.binned(points, col("o_orderdate"),
        intervals, col("l_shipdate"), col("l_shipend"),
        graft.ops.RangeJoin.timestampBins(32))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n_orders"), min(col("o_orderdate")).as("first_order"))
  }

  private val rangeJoinSql =
    """SELECT l.l_orderkey, l.l_linenumber, CAST(count(*) AS BIGINT) AS n_orders,
      |       min(o.o_orderdate) AS first_order
      |FROM lineitem l JOIN orders o
      |  ON o.o_orderdate >= l.l_shipdate
      | AND o.o_orderdate <= l.l_shipdate + INTERVAL 30 DAY
      |WHERE l.l_orderkey % 97 = 0
      |GROUP BY 1, 2""".stripMargin

  /** Interval×interval overlap join (ops.RangeJoin.binnedOverlap):
    * sampled lineitem 45-day ship windows overlapping sampled order
    * 30-day windows — both sides explode to bins, each overlapping
    * pair is kept only in its overlap-start bin (exactly once, no
    * dedup pass), exact predicate authoritative. */
  private val overlapJoinQ: Q = (s, d) => {
    val a = table(s, d, "lineitem")
      .filter(col("l_orderkey") % 61 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        expr("timestampadd(DAY, 45, l_shipdate)").as("l_shipend"))
    val b = table(s, d, "orders")
      .filter(col("o_orderkey") % 53 === 0)
      .select(col("o_orderkey"), col("o_orderdate"),
        expr("timestampadd(DAY, 30, o_orderdate)").as("o_orderend"))
    graft.ops.RangeJoin.binnedOverlap(a, col("l_shipdate"), col("l_shipend"),
        b, col("o_orderdate"), col("o_orderend"),
        graft.ops.RangeJoin.timestampBins(32))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("o_orderkey")).as("first_o"))
  }

  private val overlapJoinSql =
    """SELECT l.l_orderkey, l.l_linenumber,
      |       CAST(count(*) AS BIGINT) AS n_overlaps,
      |       min(o.o_orderkey) AS first_o
      |FROM lineitem l JOIN orders o
      |  ON l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
      | AND o.o_orderdate <= l.l_shipdate + INTERVAL 45 DAY
      |WHERE l.l_orderkey % 61 = 0 AND o.o_orderkey % 53 = 0
      |GROUP BY 1, 2""".stripMargin

  /** Per-group top-k via the bounded-buffer typed Aggregator
    * (functions.TopKAgg) — map-side combine keeps ≤ k rows per group
    * per task; the oracle recomputes it as the window row_number
    * form, so the hash-match proves the Aggregator ≡ the sort-based
    * semantics. */
  private val topkAggQ: Q = (s, d) =>
    events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.functions.TopKAgg.topK(5)(col("value"), col("event_id"))
        .as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "vk")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rnk"),
        col("vk.value").as("value"), col("vk.id").as("event_id"))

  private val topkAggSql =
    """SELECT event_type, CAST(rnk AS INT) AS rnk, value, event_id
      |FROM (SELECT event_type, value, event_id,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY value DESC, event_id) AS rnk
      |      FROM events) t
      |WHERE rnk <= 5""".stripMargin

  /** Per-type frequent users via the Misra–Gries Aggregator
    * (functions.HeavyHittersAgg). Gate capacity (4096) exceeds the
    * distinct-user count at every tested SF, where MG counts are
    * provably exact — so the oracle is a plain GROUP BY count; the
    * bounded-capacity approximation guarantee is spec-tested. */
  private val heavyHittersQ: Q = (s, d) =>
    events(s, d)
      .groupBy(col("event_type"))
      .agg(graft.functions.HeavyHittersAgg.heavyHitters(4096)(
        col("user_id").cast("string")).as("hh"))
      .select(col("event_type"), explode(col("hh")).as(Seq("user_id", "cnt")))
      .select(col("event_type"), col("user_id").cast("long").as("user_id"),
        col("cnt"))

  private val heavyHittersSql =
    """SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Incremental materialized-view maintenance: per-user stats
    * maintained as snapshot ⊕ delta partial-aggregate merge must equal
    * the oracle's full recompute (graft.ops.IncrementalAgg). */
  private val incrementalAggQ: Q = (s, d) =>
    graft.ops.IncrementalAgg.gateQuery(events(s, d))

  /** Single-pass profiling over 4 lineitem columns (string/int/date-
    * rendered min/max — see graft.sources.Profile). */
  private val profileCols =
    Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate")
  private val profileQ: Q = (s, d) =>
    graft.sources.Profile.profile(
      QueryDsl.table(s, d, "lineitem"), profileCols)

  /** Conditional aggregates via the SQL FILTER clause — one scan, one
    * hash-agg, N independent predicates (the pattern that replaces N
    * self-joins in report queries). Sum goes through the decimal trick. */
  private val filteredAggsQ: Q = (s, d) =>
    QueryDsl.table(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
      .agg(
        expr("count(*) FILTER (WHERE o_orderpriority = '1-URGENT')").as("n_urgent"),
        expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_finished"),
        expr("cast(sum(cast(o_totalprice as decimal(38,6))) " +
          "FILTER (WHERE o_orderstatus = 'O') as double)").as("open_total"),
        expr("max(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW')").as("max_low"))

  private val filteredAggsSql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
      |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total,
      |  MAX(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW') AS max_low
      |FROM orders GROUP BY 1""".stripMargin

  /** Running distinct count over a window — an aggregate Spark's window
    * functions refuse (COUNT(DISTINCT) OVER) — re-expressed exactly:
    * flag each (user, event_type)'s FIRST occurrence with row_number,
    * then running-sum the flags. Deterministic via the event_id
    * tiebreak; the oracle mirrors the same two-window construction. */
  private val wRunningDistinctQ: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ev_us"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ev_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("first_occ",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("distinct_types_so_far", sum(col("first_occ")).over(wRun))
      .select(col("user_id"), col("event_id"), col("distinct_types_so_far"))
  }

  private val wRunningDistinctSql =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type, $evUsSql AS us FROM events),
       |f AS (
       |  SELECT user_id, event_id, us,
       |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY us, event_id) = 1 THEN 1 ELSE 0 END AS first_occ
       |  FROM ev)
       |SELECT user_id, event_id,
       |  CAST(SUM(first_occ) OVER (PARTITION BY user_id ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS distinct_types_so_far
       |FROM f""".stripMargin

  /** Triangle count on the embedding near-dup graph (a < b < c edge
    * orientation — each triangle counted exactly once; the standard
    * compact-forward formulation whose join fan-out is bounded by the
    * oriented degree). */
  private val graphTrianglesQ: Q = (s, d) => {
    val e = graft.sim.Knn
      .cosineNearDupPairs(QueryDsl.table(s, d, "embeddings"), 0.38)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    val e1 = e.select(col("a"), col("b"))
    val e2 = e.select(col("a").as("b"), col("b").as("c"))
    val e3 = e.select(col("a").as("ta"), col("b").as("tc"))
    e1.join(e2, "b")
      .join(e3, col("a") === col("ta") && col("c") === col("tc"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  private val graphTrianglesSql =
    """WITH e AS (
      |  SELECT x.vec_id AS a, y.vec_id AS b
      |  FROM embeddings x, embeddings y
      |  WHERE x.vec_id < y.vec_id
      |  AND ROUND(list_dot_product(CAST(x.embedding AS DOUBLE[]),
      |    CAST(y.embedding AS DOUBLE[])), 6) >= 0.38)
      |SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |FROM e e1 JOIN e e2 ON e1.b = e2.a
      |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("a_filtered_aggs", filteredAggsQ, Some(filteredAggsSql)),
    ("w_running_distinct", wRunningDistinctQ, Some(wRunningDistinctSql)),
    ("graph_triangles", graphTrianglesQ, Some(graphTrianglesSql)),
    ("pipeline_incremental_agg", incrementalAggQ,
      Some(graft.ops.IncrementalAgg.gateSql)),
    ("quality_profile", profileQ,
      Some(graft.sources.Profile.profileSql("lineitem", profileCols))),
    ("a_topk_agg", topkAggQ, Some(topkAggSql)),
    ("a_heavy_hitters", heavyHittersQ, Some(heavyHittersSql)),
    ("rollup_year_prio", rollupQ, Some(rollupSql)),
    ("cube_flags", cubeQ, Some(cubeSql)),
    ("a_grouping_sets", groupingSetsQ, Some(groupingSetsSql)),
    ("w_rank_suite", rankSuiteQ, Some(rankSuiteSql)),
    ("p15_arrays", arrayOpsQ, Some(arrayOpsSql)),
    ("p15_json", jsonOpsQ, Some(jsonOpsSql)),
    ("j_range_binned", rangeJoinQ, Some(rangeJoinSql)),
    ("j_interval_overlap", overlapJoinQ, Some(overlapJoinSql)),
    ("except_all", exceptAllQ, Some(exceptAllSql)),
    ("intersect_all", intersectAllQ, Some(intersectAllSql)),
    ("pivot_event_counts", pivotQ, Some(pivotSql)),
    ("unpivot_event_counts", unpivotQ, Some(unpivotSql))
  )
}
