package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QueryDsl._

/** SURVEY §2 relational operator inventory (scans, projections, filters,
  * scalar transforms, joins, aggregations, windows, sorts/limits/set ops)
  * declared over the synthetic TPC-H-ish tables, each with a DuckDB
  * oracle. Names reference the SURVEY §2 operator ids they exercise.
  *
  * Reference evidence for the shapes being mirrored is cited per query
  * (file:line into /root/reference/).
  */
object RelationalQueries {

  /** S4/P1/P4/P5/P9 — filtered, projected scan with casts.
    * Mirrors the Mongo filtered+projected scan (F1_Data_PreProcessing.ipynb:31-46)
    * and float downcasts (:128-131). Filters+projection reach the parquet scan. */
  private val s4ScanProject: Q = (s, d) =>
    table(s, d, "lineitem")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_extendedprice").cast("float").as("price_f32"),
        to_date(col("l_shipdate")).as("ship_date"))

  private val s4ScanProjectSql =
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty_int,
      |CAST(l_extendedprice AS FLOAT) AS price_f32, CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin

  /** S11/O4 — recent-N scan: sort desc, limit, deterministic tiebreak.
    * Mirrors find().sort(Timestamp,-1).limit(5000) (F1-25_analyze_my_session.py:31-38). */
  private val s11RecentN: Q = (s, d) =>
    events(s, d)
      .orderBy(desc("ev_us"), desc("event_id"))
      .limit(500)
      .select(col("event_id"), col("user_id"), col("ev_us"))

  private val s11RecentNSql =
    s"""SELECT event_id, user_id, $evUsSql AS ev_us FROM events
       |ORDER BY ev_us DESC, event_id DESC LIMIT 500""".stripMargin

  /** P6/P7 — set membership + inequality filters.
    * Mirrors Year.isin / Driver.isin (F1_Preprocessed_Data_test.ipynb:52, P1 ipynb:558). */
  private val p6Isin: Q = (s, d) =>
    table(s, d, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
        col("c_nationkey") =!= 3)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))

  private val p6IsinSql =
    """SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
      |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_nationkey <> 3""".stripMargin

  /** P10 — dictionary encode (string→int) with upper() normalization.
    * Mirrors the compound map {SOFT:1..WET:5, else 0} (F1_Data_PreProcessing.ipynb:336-342). */
  private val p10Encode: Q = (s, d) =>
    table(s, d, "orders")
      .withColumn("prio_code",
        when(upper(col("o_orderpriority")) === "1-URGENT", 1)
          .when(upper(col("o_orderpriority")) === "2-HIGH", 2)
          .when(upper(col("o_orderpriority")) === "3-MEDIUM", 3)
          .when(upper(col("o_orderpriority")) === "4-NOT SPECIFIED", 4)
          .when(upper(col("o_orderpriority")) === "5-LOW", 5)
          .otherwise(0))
      .groupBy(col("prio_code")).agg(count(lit(1)).as("n"))

  private val p10EncodeSql =
    """SELECT CASE UPPER(o_orderpriority) WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
      |WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE 0 END
      |AS prio_code, COUNT(*) AS n FROM orders GROUP BY 1""".stripMargin

  /** P11 — string functions: upper, trim/lower, regexp_replace, split, concat.
    * Mirrors F1_Data_PreProcessing.ipynb:341, train_by_circuit.py:187,194,
    * F1_web_dashboard_app.py:197. */
  private val p11Strings: Q = (s, d) =>
    table(s, d, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        regexp_replace(col("c_name"), "[^A-Za-z0-9]", "").as("name_alnum"),
        split_part(col("c_name"), lit("#"), lit(2)).cast("bigint").as("key_from_name"),
        concat(lower(trim(col("c_mktsegment"))), lit(":"), col("c_nationkey")).as("seg_tag"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"))

  private val p11StringsSql =
    """SELECT c_custkey, UPPER(c_name) AS name_upper,
      |regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g') AS name_alnum,
      |CAST(split_part(c_name, '#', 2) AS BIGINT) AS key_from_name,
      |lower(trim(c_mktsegment)) || ':' || CAST(c_nationkey AS VARCHAR) AS seg_tag,
      |substring(c_name, 1, 8) AS name_prefix, length(c_name) AS name_len
      |FROM customer""".stripMargin

  /** P12 — date/time scalars: year/month/day extraction, epoch seconds.
    * Mirrors timedelta→seconds and date stringification (F1_Data_Collect.ipynb:146-148). */
  private val p12Datetime: Q = (s, d) =>
    events(s, d)
      .select(
        col("event_id"),
        year(col("ev_ts")).as("y"),
        month(col("ev_ts")).as("m"),
        dayofmonth(col("ev_ts")).as("dom"),
        hour(col("ev_ts")).as("h"),
        expr("ev_us div 1000000").as("epoch_s"))

  private val p12DatetimeSql =
    s"""SELECT event_id, CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS y,
       |CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS m,
       |CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS dom,
       |CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h,
       |$evUsSql // 1000000 AS epoch_s FROM events""".stripMargin

  /** P13 — math scalars: unit scale ×100, ×1.05 bias, sqrt, min-max scale
    * with fixed bounds, delta subtraction. Per-row double ops are
    * deterministic → no rounding needed.
    * Mirrors F1-25_Telemetry_DB_Record.py:165-166, P3 ipynb:316, P1 ipynb:101,
    * P2 ipynb:112-113. */
  private val p13Math: Q = (s, d) =>
    table(s, d, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        (col("l_discount") * 100.0).as("disc_pct"),
        (col("l_extendedprice") * 1.05).as("price_biased"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        ((col("l_quantity") - 1.0) / (50.0 - 1.0)).as("qty_scaled"),
        (col("l_extendedprice") - col("l_tax") * col("l_extendedprice")).as("price_net"))

  private val p13MathSql =
    """SELECT l_orderkey, l_discount * 100.0 AS disc_pct,
      |l_extendedprice * 1.05 AS price_biased, sqrt(l_quantity) AS qty_sqrt,
      |(l_quantity - 1.0) / (50.0 - 1.0) AS qty_scaled,
      |l_extendedprice - l_tax * l_extendedprice AS price_net
      |FROM lineitem WHERE l_linenumber = 1""".stripMargin

  /** P14 — conditional bucketing (when/when/otherwise advice rules).
    * Mirrors the coaching advice thresholds (P3 ipynb:162-167). */
  private val p14Buckets: Q = (s, d) =>
    table(s, d, "orders")
      .withColumn("band",
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))

  private val p14BucketsSql =
    s"""SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
       |WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS band,
       |COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY 1""".stripMargin

  /** J1/A5 — left join plan-vs-actual with zero-fill (the audit query).
    * Mirrors merge(df_meta, df_actual, how='left') + fillna(0)
    * (F1_Data_Test.ipynb:174-178). nation is the "plan", customer counts
    * the "actual"; dims broadcast. */
  private val j1LeftFill: Q = (s, d) => {
    val nation = table(s, d, "nation")
    val counts = table(s, d, "customer")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
    broadcast(nation)
      .join(counts, nation("n_nationkey") === counts("c_nationkey"), "left")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("cnt"), lit(0L)).as("cust_cnt"))
  }

  private val j1LeftFillSql =
    """SELECT n_nationkey, n_name, CAST(COALESCE(cnt, 0) AS BIGINT) AS cust_cnt
      |FROM nation LEFT JOIN
      |(SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY 1) c
      |ON n_nationkey = c_nationkey""".stripMargin

  /** J2 — keyed align self-join of two filtered branches + delta.
    * Mirrors the per-lap pace-gap self join (P1 ipynb:605-614): two driver
    * series joined on LapNumber → here two order-years joined on custkey. */
  private val j2SelfAlign: Q = (s, d) => {
    val o = table(s, d, "orders")
    val a = o.filter(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n95"))
    val b = o.filter(year(col("o_orderdate")) === 1996)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n96"))
    a.join(b, Seq("o_custkey"), "inner")
      .select(col("o_custkey"), col("n95"), col("n96"),
        (col("n96") - col("n95")).as("gap"))
  }

  private val j2SelfAlignSql =
    """SELECT a.o_custkey, n95, n96, n96 - n95 AS gap FROM
      |(SELECT o_custkey, COUNT(*) AS n95 FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1) a
      |JOIN (SELECT o_custkey, COUNT(*) AS n96 FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1) b
      |ON a.o_custkey = b.o_custkey""".stripMargin

  /** J4/A2-style — multi-hop broadcast dimension join + exact agg.
    * Mirrors the lookup/dimension joins (F1_web_dashboard_app.py:21-86):
    * fact lineitem → supplier → nation → region, small dims broadcast. */
  private val j4DimJoin: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val sup = broadcast(table(s, d, "supplier"))
    val nat = broadcast(table(s, d, "nation"))
    val reg = broadcast(table(s, d, "region"))
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .join(reg, nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val j4DimJoinSql =
    s"""SELECT r_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |COUNT(*) AS n_items
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name""".stripMargin

  /** Left-semi join — customers having at least one order (EXISTS). */
  private val jSemi: Q = (s, d) => {
    val c = table(s, d, "customer")
    val o = table(s, d, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  private val jSemiSql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Left-anti join — customers with no orders (NOT EXISTS). */
  private val jAnti: Q = (s, d) => {
    val c = table(s, d, "customer")
    val o = table(s, d, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
  }

  private val jAntiSql =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** A1 — hash-agg, multiple functions per group, deterministic "first"
    * via min_by. Mirrors the lap rollup (F1_Data_PreProcessing.ipynb:289-299)
    * where pandas first → min_by(Compound, Distance). sum(l_quantity) is a
    * sum of small integers in double → exact. */
  private val a1MultiAgg: Q = (s, d) =>
    table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("sum_qty"),
        max(col("l_extendedprice")).as("max_price"),
        // chr(min(ascii(..))) == min over 1-char strings, but keeps the
        // agg buffer fixed-width so Spark plans HashAggregate instead
        // of falling back to a sort-based aggregate (string buffers are
        // not hash-agg capable)
        chr(min(ascii(col("l_linestatus")))).as("min_status"),
        max(to_date(col("l_shipdate"))).as("last_ship"))

  private val a1MultiAggSql =
    """SELECT l_orderkey, COUNT(*) AS n_lines, SUM(l_quantity) AS sum_qty,
      |MAX(l_extendedprice) AS max_price,
      |CHR(CAST(MIN(ASCII(l_linestatus)) AS INT)) AS min_status,
      |MAX(CAST(l_shipdate AS DATE)) AS last_ship
      |FROM lineitem GROUP BY l_orderkey""".stripMargin

  /** A2 — per-year stats. Mirrors the Mongo $group per Year
    * (F1_Data_Interactive_Analysis.ipynb:30-38). */
  private val a2YearStats: Q = (s, d) =>
    events(s, d)
      .groupBy(year(col("ev_ts")).as("yr_raw"))
      .agg(davg(col("value")).as("avg_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("data_points"))
      .select(col("yr_raw").cast("int").as("yr"), col("avg_value"),
        col("max_value"), col("data_points"))

  private val a2YearStatsSql =
    s"""SELECT CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS yr,
       |${davgSql("value")} AS avg_value, MAX(value) AS max_value,
       |COUNT(*) AS data_points FROM events GROUP BY 1""".stripMargin

  /** A3 — filtered group stats ($match → $group).
    * Mirrors F1_Data_Interactive_Analysis.ipynb:48-59. */
  private val a3FilteredGroup: Q = (s, d) =>
    events(s, d)
      .filter(col("event_type").isin("click", "view", "purchase") && col("value") > 5.0)
      .groupBy(col("event_type"))
      .agg(davg(col("value")).as("avg_value"),
        davg(col("user_id").cast("double")).as("avg_user"))

  private val a3FilteredGroupSql =
    s"""SELECT event_type, ${davgSql("value")} AS avg_value,
       |${davgSql("CAST(user_id AS DOUBLE)")} AS avg_user
       |FROM events WHERE event_type IN ('click','view','purchase') AND value > 5.0
       |GROUP BY event_type""".stripMargin

  /** A4 — distinct cardinality per group.
    * Mirrors $addToSet + $size per (Year,Round) (F1_Data_Test.ipynb:150-167). */
  private val a4DistinctCard: Q = (s, d) =>
    table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  private val a4DistinctCardSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** A6/A9/A1 — group min/max + deterministic "first" via min_by over a
    * unique ordering key (pandas 'first' → min_by, SURVEY §2.4 A1 caveat).
    * Mirrors fastest-lap-per-driver (P3 ipynb:57) over order prices. */
  private val a6GroupMin: Q = (s, d) =>
    table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min_by(col("o_orderpriority"), col("o_orderkey")).as("first_prio"))

  private val a6GroupMinSql =
    """SELECT o_custkey, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |min_by(o_orderpriority, o_orderkey) AS first_prio
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** A7 — season rollup: two-level aggregation over an aggregate.
    * Mirrors groupby('Year').agg(count, mean, sum) on the audit table
    * (F1_Data_Test.ipynb:203-208). */
  private val a7Rollup: Q = (s, d) => {
    val perCust = table(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr_raw"), col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("cust_total"))
    perCust.groupBy(col("yr_raw").cast("int").as("yr"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("n_orders")).as("n_orders"),
        dsum(col("cust_total")).as("year_total"))
  }

  private val a7RollupSql =
    s"""SELECT CAST(yr AS INT) AS yr, COUNT(*) AS n_custs, CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       |${dsumSql("cust_total")} AS year_total FROM
       |(SELECT year(o_orderdate) AS yr, o_custkey, COUNT(*) AS n_orders,
       |${dsumSql("o_totalprice")} AS cust_total FROM orders GROUP BY 1, 2) t
       |GROUP BY 1""".stripMargin

  /** A8 — global scalar aggregates (single row).
    * Mirrors Speed.max()/min()/nunique() (F1_web_dashboard_app.py:225-230). */
  private val a8Global: Q = (s, d) =>
    table(s, d, "lineitem")
      .agg(max(col("l_extendedprice")).as("max_price"),
        min(to_date(col("l_shipdate"))).as("min_ship"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_rows"))

  private val a8GlobalSql =
    """SELECT MAX(l_extendedprice) AS max_price, MIN(CAST(l_shipdate AS DATE)) AS min_ship,
      |COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(*) AS n_rows FROM lineitem""".stripMargin

  /** A9 — sorted unique value list.
    * Mirrors sorted(df['Driver'].unique()) (F1_web_dashboard_app.py:252). */
  private val a9Unique: Q = (s, d) =>
    table(s, d, "orders")
      .select(col("o_orderpriority")).distinct().orderBy(col("o_orderpriority"))

  private val a9UniqueSql =
    "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"

  /** W1 — group-min broadcast back (analytic min over partition) + delta.
    * Mirrors Session_Fastest = transform('min') + Pace_Ratio (P1 ipynb:262-267). */
  private val w1RatioMin: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
    table(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        min(col("c_acctbal")).over(w).as("seg_min"),
        (col("c_acctbal") - min(col("c_acctbal")).over(w)).as("bal_delta"))
  }

  private val w1RatioMinSql =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |MIN(c_acctbal) OVER (PARTITION BY c_mktsegment) AS seg_min,
      |c_acctbal - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment) AS bal_delta
      |FROM customer""".stripMargin

  /** W2 — lag features over an ordered partition (unique order key).
    * Mirrors Prev_Pace_Ratio shift(1) (P1 ipynb:456-460). */
  private val w2Lag: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ev_us"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lag(col("ev_us"), 1).over(w).as("prev_us"))
  }

  private val w2LagSql =
    s"""SELECT event_id, user_id, $evUsSql AS ev_us, value,
       |LAG(value, 1) OVER (PARTITION BY user_id ORDER BY $evUsSql, event_id) AS prev_value,
       |LAG($evUsSql, 1) OVER (PARTITION BY user_id ORDER BY $evUsSql, event_id) AS prev_us
       |FROM events""".stripMargin

  /** W3 — running total with explicit ROWS frame; decimal-exact running sum.
    * Mirrors Cumulative_Time cumsum (P1 ipynb:585). */
  private val w3Running: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("ev_us"),
        sum(col("value").cast("decimal(38,6)")).over(w).cast("double").as("running_value"),
        count(lit(1)).over(w).as("seq_no"))
  }

  private val w3RunningSql =
    s"""SELECT event_id, user_id, $evUsSql AS ev_us,
       |CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY $evUsSql, event_id
       |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       |COUNT(*) OVER (PARTITION BY user_id ORDER BY $evUsSql, event_id
       |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq_no
       |FROM events""".stripMargin

  /** W4 — arg-min within group (top-1 per partition by row_number).
    * Mirrors the fastest-lap idxmin (F1_Preprocessed_Data_test.ipynb:66-69). */
  private val w4Argmin: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    table(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  private val w4ArgminSql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM
      |(SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |ORDER BY o_totalprice, o_orderkey) AS rn FROM orders) t
      |WHERE rn = 1""".stripMargin

  /** W7 — gaps-and-islands sessionization: new island when the gap to the
    * previous event exceeds 30 min; per-island rollup.
    * Mirrors the problem-zone segmentation (P3 ipynb:146-169). */
  private val w7Islands: Q = (s, d) => {
    val wo = Window.partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("prev_us", lag(col("ev_us"), 1).over(wo))
      .withColumn("new_island",
        when(col("prev_us").isNull ||
          col("ev_us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wf))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ev_us")).as("start_us"),
        max(col("ev_us")).as("end_us"),
        dsum(col("value")).as("island_value"))
  }

  private val w7IslandsSql =
    s"""SELECT user_id, island, COUNT(*) AS n_events, MIN(ev_us) AS start_us,
       |MAX(ev_us) AS end_us, ${dsumSql("value")} AS island_value FROM
       |(SELECT user_id, value, ev_us,
       |  CAST(SUM(new_island) OVER (PARTITION BY user_id ORDER BY ev_us, event_id
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island FROM
       |  (SELECT user_id, event_id, value, $evUsSql AS ev_us,
       |   CASE WHEN LAG($evUsSql, 1) OVER (PARTITION BY user_id ORDER BY $evUsSql, event_id) IS NULL
       |   OR $evUsSql - LAG($evUsSql, 1) OVER (PARTITION BY user_id ORDER BY $evUsSql, event_id)
       |   > 1800 * 1000000 THEN 1 ELSE 0 END AS new_island FROM events) a) b
       |GROUP BY user_id, island""".stripMargin

  /** W8 — the 107% outlier rule: keep rows within 1.07× of the partition
    * min and above an absolute floor (F1_Data_PreProcessing.ipynb:313-333). */
  private val w8PctFilter: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
    table(s, d, "orders")
      .withColumn("min_price", min(col("o_totalprice")).over(w))
      .filter(col("o_totalprice") <= col("min_price") * 1.07 &&
        col("o_totalprice") > 1000.0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("min_price"))
  }

  private val w8PctFilterSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, min_price FROM
      |(SELECT o_custkey, o_orderkey, o_totalprice,
      |MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS min_price FROM orders) t
      |WHERE o_totalprice <= min_price * 1.07 AND o_totalprice > 1000.0""".stripMargin

  /** O4 — global top-k with deterministic tiebreak (TakeOrderedAndProject).
    * Mirrors top-5 problem zones by loss (P3 ipynb:355-359). */
  private val o4TopK: Q = (s, d) =>
    table(s, d, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val o4TopKSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** O6 — union all of per-branch frames (concat).
    * Mirrors pd.concat of per-lap frames (F1_Data_PreProcessing.ipynb:125). */
  private val o6Union: Q = (s, d) => {
    val o = table(s, d, "orders")
    val hi = o.filter(col("o_totalprice") > 350000)
      .select(col("o_orderkey"), lit("high").as("src"))
    val lo = o.filter(col("o_totalprice") < 5000)
      .select(col("o_orderkey"), lit("low").as("src"))
    hi.unionByName(lo)
  }

  private val o6UnionSql =
    """SELECT o_orderkey, 'high' AS src FROM orders WHERE o_totalprice > 350000
      |UNION ALL
      |SELECT o_orderkey, 'low' AS src FROM orders WHERE o_totalprice < 5000""".stripMargin

  /** O7 — dedup: full-row distinct on a projection.
    * Mirrors drop_duplicates (F1_Data_PreProcessing.ipynb:70). */
  private val o7Dedup: Q = (s, d) =>
    table(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()

  private val o7DedupSql =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** Set intersect — customers active in both 1995 and 1996. */
  private val setIntersect: Q = (s, d) => {
    val o = table(s, d, "orders")
    o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      .intersect(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
  }

  private val setIntersectSql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin

  /** Set except — customers active in 1995 but not 1996. */
  private val setExcept: Q = (s, d) => {
    val o = table(s, d, "orders")
    o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      .except(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
  }

  private val setExceptSql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin

  /** Tumbling-window (hourly) aggregation, batch form of the streaming
    * windowed agg (SURVEY §2.8 extension). */
  /** Exactly-once restoration over an at-least-once source: a
    * deterministic 10% of events is "redelivered" (unioned back in),
    * then StreamOps.exactlyOnce drops the duplicates by id — counts
    * and sums return to the original table's. The streaming form
    * (dropDuplicatesWithinWatermark, bounded state) is exercised in
    * StreamOpsSpec. */
  private val streamDedup: Q = (s, d) => {
    val ev = events(s, d)
    graft.streaming.StreamOps.exactlyOnce(
        ev.unionByName(ev.filter(col("event_id") % 10 === 0)),
        watermarked = false)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
  }

  private val streamDedupSql =
    s"""SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
       |FROM (SELECT DISTINCT * FROM
       |  (SELECT * FROM events UNION ALL
       |   SELECT * FROM events WHERE event_id % 10 = 0) u) t
       |GROUP BY 1""".stripMargin

  /** Second-moment aggregates made cross-engine bit-exact: built-in
    * var_samp/stddev/corr sum doubles in partition order (never
    * comparable across engines). The exact sums here live in LONG
    * space — l_quantity is integer-valued (≤ 50) and l_discount
    * carries ≤ 2 decimals (≤ 0.1), so q = quantity and d100 =
    * round(discount·100) are exact integers and every Σ is an exact,
    * order-independent, CODEGEN'D long sum (the previous decimal(38,6)
    * form was bit-identical but ran the non-codegen BigDecimal path —
    * 6 interpreted streams, measured ~2 s at sf0.1 vs ~0.3 s for
    * this). Overflow headroom: Σq² ≤ 2500·N fits a long to N ≈ 3.7e15
    * rows — comfortably past 100 TB of lineitem. The closed-form
    * moments then divide the long sums back through identical double
    * expression trees on both engines (scale factors 100/10⁴ fold
    * into td1/td2/sd11 first, keeping the classic formulas verbatim). */
  private val aMoments: Q = (s, d) => {
    val q = col("l_quantity").cast("long")
    val d100 = round(col("l_discount") * 100).cast("long")
    val m = table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("s1l"), sum(q * q).as("s2l"),
        sum(d100).as("t1l"), sum(d100 * d100).as("t2l"),
        sum(q * d100).as("s11l"))
      .select(col("l_returnflag"), col("n"),
        col("s1l").cast("double").as("s1"),
        col("s2l").cast("double").as("s2"),
        (col("t1l").cast("double") / 100.0).as("t1"),
        (col("t2l").cast("double") / 10000.0).as("t2"),
        (col("s11l").cast("double") / 100.0).as("s11"))
    m.select(col("l_returnflag"), col("n"),
      (col("s1") / col("n")).as("mean_qty"),
      ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
        .as("var_qty"),
      sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
        .as("stddev_qty"),
      ((col("s11") - col("s1") * col("t1") / col("n")) /
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) *
          (col("t2") - col("t1") * col("t1") / col("n"))))
        .as("corr_qty_disc"))
  }

  private val aMomentsSql =
    """SELECT l_returnflag, n,
      |  s1 / n AS mean_qty,
      |  (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
      |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_qty,
      |  (s11 - s1 * t1 / n) /
      |    sqrt((s2 - s1 * s1 / n) * (t2 - t1 * t1 / n)) AS corr_qty_disc
      |FROM (SELECT l_returnflag, n,
      |  CAST(s1l AS DOUBLE) AS s1, CAST(s2l AS DOUBLE) AS s2,
      |  CAST(t1l AS DOUBLE) / 100.0 AS t1,
      |  CAST(t2l AS DOUBLE) / 10000.0 AS t2,
      |  CAST(s11l AS DOUBLE) / 100.0 AS s11
      |FROM (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(q) AS BIGINT) AS s1l, CAST(SUM(q * q) AS BIGINT) AS s2l,
      |  CAST(SUM(d100) AS BIGINT) AS t1l, CAST(SUM(d100 * d100) AS BIGINT) AS t2l,
      |  CAST(SUM(q * d100) AS BIGINT) AS s11l
      |FROM (SELECT l_returnflag,
      |        CAST(l_quantity AS BIGINT) AS q,
      |        CAST(round(l_discount * 100) AS BIGINT) AS d100
      |      FROM lineitem) b GROUP BY 1) raw) m""".stripMargin

  /** RANGE window frame (value-based, not row-count-based): per
    * customer, the trailing-90-day order count and decimal-exact spend
    * on the epoch-day axis. RANGE frames include order-key peers (two
    * same-day orders sit in each other's frame), so the result is
    * deterministic without a unique tie-break — the property ROWS
    * frames don't have. */
  private val wRangeFrame: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-90, Window.currentRow)
    table(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .as("d"))
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("o_totalprice").cast("decimal(38,6)")).over(w)
          .cast("double").as("sum_trailing"))
  }

  private val wRangeFrameSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(count(*) OVER w AS BIGINT) AS n_trailing,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
      |    AS sum_trailing
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             datediff('day', DATE '1970-01-01', o_orderdate) AS d
      |      FROM orders) t
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
      |             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Truncated exponential moving average per user — the time-decay
    * feature every behavioral training pipeline derives (recency-
    * weighted activity). Fixed depth k=8 keeps the state a pure
    * window expression (8 lags, one shuffle on the user key — no
    * recursive state); decay 0.75^i weights are exact binary doubles
    * (3^i/2^(2i)), and numerator/denominator are explicit left-fold
    * addition chains, so the arithmetic is bit-identical cross-engine
    * before the final round(6). Normalizing by the sum of PRESENT
    * weights makes the warm-up rows (fewer than k predecessors) a
    * weighted average rather than a decayed-toward-zero artifact. */
  private val ewmaDepth = 8
  private val wEwma: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val terms = (0 until ewmaDepth).map { i =>
      val c = if (i == 0) col("value") else lag(col("value"), i).over(w)
      (c, math.pow(0.75, i))
    }
    val num = terms.map { case (c, wt) => coalesce(c * lit(wt), lit(0.0)) }
      .reduce(_ + _)
    val den = terms.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("value"), col("ev_us"))
      .withColumn("ewma", round(num / den, 6))
      .select(col("event_id"), col("user_id"), col("value"), col("ewma"))
  }

  private val wEwmaSql: String = {
    def wt(i: Int) = new java.math.BigDecimal(math.pow(0.75, i)).toPlainString
    def lagc(i: Int) = if (i == 0) "value" else s"lag(value, $i) OVER w"
    val num = (0 until ewmaDepth)
      .map(i => s"COALESCE(${lagc(i)} * CAST(${wt(i)} AS DOUBLE), CAST(0 AS DOUBLE))")
      .mkString(" + ")
    val den = (0 until ewmaDepth)
      .map(i => s"(CASE WHEN ${lagc(i)} IS NOT NULL THEN CAST(${wt(i)} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)")
      .mkString(" + ")
    s"""WITH ev AS (
       |  SELECT event_id, user_id, value, $evUsSql AS us FROM events)
       |SELECT event_id, user_id, value,
       |  ROUND(($num) / ($den), 6) AS ewma
       |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin
  }

  /** Hopping (sliding) event-time windows: 1-hour windows every 15
    * minutes — each event lands in exactly 4 windows. Batch form of
    * the streaming `window(ts, "1 hour", "15 minutes")` aggregation;
    * the oracle enumerates the 4 hop offsets per event. */
  private val streamHopping: Q = (s, d) =>
    events(s, d)
      .groupBy(window(col("ev_ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))

  private val streamHoppingSql =
    s"""WITH e AS (SELECT event_type, $evUsSql AS us FROM events),
       |hops AS (
       |  SELECT event_type,
       |         (us // 900000000 - h.i) * 900000000 AS win_start_us
       |  FROM e, (SELECT unnest(generate_series(0, 3)) AS i) h
       |  WHERE (us // 900000000 - h.i) * 900000000 + 3600000000 > us
       |    AND (us // 900000000 - h.i) * 900000000 <= us
       |)
       |SELECT win_start_us, event_type, CAST(count(*) AS BIGINT) AS n
       |FROM hops GROUP BY 1, 2""".stripMargin

  /** Ordered view→click→purchase funnel (ops.Funnel typed kernel:
    * one user-key shuffle, linear in-group scan — no per-stage
    * self-joins). */
  private val aFunnelSteps: Q = (s, d) =>
    graft.ops.Funnel.stages3(events(s, d), "view", "click", "purchase")

  private val aFunnelStepsSql =
    graft.ops.Funnel.stages3Sql("view", "click", "purchase", evUsSql)

  /** 4-stage form via the generalized N-stage kernel (same single
    * shuffle + O(stages) state regardless of N; the oracle needs one
    * chained self-join per stage — exactly the asymmetry the typed
    * kernel exists to avoid). */
  private val funnel4Stages = Seq("signup", "view", "click", "purchase")
  private val aFunnelSteps4: Q = (s, d) =>
    graft.ops.Funnel.stages(events(s, d), funnel4Stages)

  private val aFunnelSteps4Sql =
    graft.ops.Funnel.stagesSql(funnel4Stages, evUsSql)

  /** SCD2 validity-interval history from the event change stream
    * (ops.Scd2): run-collapse + lead, two windows on one shuffle. */
  private val scd2History: Q = (s, d) =>
    graft.ops.Scd2.history(events(s, d))

  private val scd2HistorySql = graft.ops.Scd2.historySql(evUsSql)

  /** Null-safe equi-join (<=>): NULL keys MATCH each other — the
    * semantics a plain `=` join silently drops. Keys are derived with
    * planted NULLs on both sides; the null group's presence in the
    * output is the proof the operator joined them. Plans as a normal
    * hash join (null-safe equality is a valid equi-key), not a nested
    * loop. */
  private val jNullSafe: Q = (s, d) => {
    val a = table(s, d, "customer").select(col("c_custkey"),
      when(col("c_custkey") % 7 === 0, lit(null))
        .otherwise(col("c_nationkey") % 5).as("ka"))
    val b = table(s, d, "nation").select(col("n_nationkey"),
      when(col("n_nationkey") % 6 === 0, lit(null))
        .otherwise(col("n_nationkey") % 5).as("kb"))
    a.join(b, col("ka") <=> col("kb"))
      .groupBy(col("ka").as("k"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("n_nationkey")).as("n_nations"))
  }

  private val jNullSafeSql =
    """WITH a AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey % 5 END AS ka
      |  FROM customer),
      |b AS (
      |  SELECT n_nationkey,
      |    CASE WHEN n_nationkey % 6 = 0 THEN NULL ELSE n_nationkey % 5 END AS kb
      |  FROM nation)
      |SELECT ka AS k, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_nations
      |FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
      |GROUP BY 1""".stripMargin

  /** TPC-H Q14-shaped promo revenue share: lineitem ⋈ part (broadcast
    * dim — the one table no other gate touches), revenue split by the
    * PROMO type flag per ship-year via conditional aggregation, share
    * as one deterministic division of two decimal-exact sums. */
  private val jPartPromoShare: Q = (s, d) => {
    val li = table(s, d, "lineitem")
      .select(col("l_partkey"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val part = table(s, d, "part").select(col("p_partkey"), col("p_type"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"))
      .agg(
        dsum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0)))
          .as("promo_rev"),
        dsum(col("rev")).as("total_rev"))
      .withColumn("promo_share", col("promo_rev") / col("total_rev"))
  }

  private val jPartPromoShareSql =
    s"""WITH j AS (
       |  SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       |    l_extendedprice * (1.0 - l_discount) AS rev, p_type
       |  FROM lineitem JOIN part ON l_partkey = p_partkey)
       |SELECT ship_year,
       |  ${dsumSql("CASE WHEN p_type = 'PROMO' THEN rev ELSE 0.0 END")} AS promo_rev,
       |  ${dsumSql("rev")} AS total_rev,
       |  ${dsumSql("CASE WHEN p_type = 'PROMO' THEN rev ELSE 0.0 END")} /
       |    ${dsumSql("rev")} AS promo_share
       |FROM j GROUP BY 1""".stripMargin

  /** Incremental join maintenance (ops.IncrementalJoin): customers
    * and orders are each split old/delta by deterministic hash; the
    * maintained view (old⋈old ∪ Δ-join) must equal the full join —
    * verified through a per-segment rollup so the gate rows stay
    * small while every pair still counts. */
  private val pipelineIncrementalJoin: Q = (s, d) => {
    val cust = table(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = table(s, d, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val (cOld, cDelta) = (cust.where(col("c_custkey") % 7 =!= 0),
      cust.where(col("c_custkey") % 7 === 0))
    val (oOld, oDelta) = (ord.where(col("c_custkey") % 10 =!= 3),
      ord.where(col("c_custkey") % 10 === 3))
    val oldView = cOld.join(oOld, Seq("c_custkey"))
    graft.ops.IncrementalJoin
      .maintain(oldView, cOld, cDelta, oOld, oDelta, Seq("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_pairs"),
        dsum(col("o_totalprice")).as("total"))
  }

  private val pipelineIncrementalJoinSql =
    s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_pairs,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |GROUP BY 1""".stripMargin

  /** CDC changelog apply (ops.Cdc): event_type derives the op
    * (signup→I, purchase→D, else U); latest change wins, final
    * deletes drop the key. */
  private val pipelineCdcApply: Q = (s, d) =>
    graft.ops.Cdc.applyChangelog(events(s, d)
      .withColumn("op",
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "purchase", "D")
          .otherwise("U")))

  private val pipelineCdcApplySql = graft.ops.Cdc.applyChangelogSql(evUsSql)

  /** SCD2 point-in-time enrichment: each purchase event looks up the
    * state interval covering its timestamp — the as-of predicate the
    * Scd2 scaladoc promises (`valid_from <= t < valid_to`, open
    * current rows match via the -1 sentinel). Equi-join on user_id
    * carries the shuffle; the interval predicate is a post-join
    * filter, so this plans as a plain sort-merge join, not a range
    * explosion — per user the interval count is the change count,
    * bounded and small. */
  private val jScd2PointInTime: Q = (s, d) => {
    val hist = graft.ops.Scd2.history(events(s, d))
      .select(col("user_id"), col("value").as("state"),
        col("valid_from"), col("valid_to"))
    val probes = events(s, d)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ev_us").as("t"), col("event_id"))
    probes.join(hist, probes("user_id") === hist("user_id") &&
        col("valid_from") <= col("t") &&
        (col("t") < col("valid_to") || col("valid_to") === -1L))
      .select(col("event_id"), probes("user_id"), col("t"),
        col("state"), col("valid_from"))
  }

  private val jScd2PointInTimeSql =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, $evUsSql AS us, event_id, value
       |  FROM events),
       |m AS (
       |  SELECT user_id, event_type, us, event_id,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
       |  FROM ev),
       |runs AS (
       |  SELECT user_id, event_type, us, event_id FROM m
       |  WHERE prev IS NULL OR prev <> event_type),
       |hist AS (
       |  SELECT user_id, event_type AS state, us AS valid_from,
       |    COALESCE(CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT), -1) AS valid_to
       |  FROM runs),
       |probes AS (
       |  SELECT user_id, us AS t, event_id FROM ev
       |  WHERE event_type = 'purchase')
       |SELECT p.event_id, p.user_id, p.t, h.state, h.valid_from
       |FROM probes p JOIN hist h ON p.user_id = h.user_id
       |  AND h.valid_from <= p.t
       |  AND (p.t < h.valid_to OR h.valid_to = -1)""".stripMargin

  /** Time-grid forward-fill resample (ops.TimeGrid): 6-hour aligned
    * grid over each user's event span, latest-value fill via the
    * as-of idiom. */
  private val aTimeGridFfill: Q = (s, d) =>
    graft.ops.TimeGrid.resampleFfill(events(s, d), 21600000000L)

  private val aTimeGridFfillSql =
    graft.ops.TimeGrid.resampleFfillSql(21600000000L, evUsSql)

  /** Time-weighted average of `value` per user (trapezoid rule over
    * the event timeline) — the telemetry integral: sensors sample
    * irregularly, so the plain AVG over-weights bursts. Exactness:
    * term magnitudes reach ~1e13, where "round to 6 decimals" is
    * below the double ulp and engines disagree — so the integral is
    * computed in EXACT integer space instead: values quantize ×100
    * (the data is 2-decimal money-style; round-to-nearest of an
    * almost-integer double agrees everywhere), each trapezoid is one
    * long product, the sum is decimal(38,0)-exact, and a single
    * double expression at the end divides out the 200× and the span.
    * Single-event users carry no interval and are dropped. One
    * shuffle (the lead window). */
  private val aTimeWeightedAvg: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    events(s, d)
      .withColumn("vq", round(col("value") * 100, 0).cast("long"))
      .withColumn("nxt_us", lead(col("ev_us"), 1).over(w))
      .withColumn("nxt_vq", lead(col("vq"), 1).over(w))
      .where(col("nxt_us").isNotNull)
      .withColumn("term_q",
        (col("vq") + col("nxt_vq")) * (col("nxt_us") - col("ev_us")))
      .groupBy(col("user_id"))
      .agg(sum(col("term_q").cast("decimal(38,0)")).cast("double").as("area2"),
        (max(col("nxt_us")) - min(col("ev_us"))).as("span_us"))
      .select(col("user_id"),
        (col("area2") / lit(200.0) / col("span_us").cast("double")).as("twa"),
        col("span_us"))
  }

  private val aTimeWeightedAvgSql =
    s"""WITH ev AS (
       |  SELECT user_id, $evUsSql AS us, event_id,
       |    CAST(round(value * 100, 0) AS BIGINT) AS vq FROM events),
       |seg AS (
       |  SELECT user_id, us, vq,
       |    lead(us) OVER w AS nxt_us, lead(vq) OVER w AS nxt_vq
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |t AS (
       |  SELECT user_id, (vq + nxt_vq) * (nxt_us - us) AS term_q, us, nxt_us
       |  FROM seg WHERE nxt_us IS NOT NULL)
       |SELECT user_id,
       |  CAST(sum(CAST(term_q AS DECIMAL(38,0))) AS DOUBLE) / 200.0
       |    / CAST(max(nxt_us) - min(us) AS DOUBLE) AS twa,
       |  max(nxt_us) - min(us) AS span_us
       |FROM t GROUP BY 1""".stripMargin

  /** Fixed-width histogram per group INCLUDING empty bins — the
    * left-join-to-spine semantics a naive GROUP BY silently drops
    * (a dashboard that omits empty bins lies about the distribution).
    * The spine is generated (flag × 8 bins, a few dozen rows), the
    * counts come from one partial-aggregated shuffle, and the join is
    * a broadcast of the counts ONTO the spine. */
  private val aHistogramBins = 8
  private val aHistogram: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val top = lit(80000.0)
    val counts = li
      .withColumn("bin",
        least(floor(col("l_extendedprice") / top * aHistogramBins), lit(aHistogramBins - 1))
          .cast("int"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("n"))
    // spine flags come from the tiny post-agg counts frame (a flag
    // with any row at all appears there) — no second corpus scan
    val spine = counts.select(col("l_returnflag")).distinct()
      .select(col("l_returnflag"),
        explode(sequence(lit(0), lit(aHistogramBins - 1))).as("bin"))
    spine.join(counts, Seq("l_returnflag", "bin"), "left")
      .select(col("l_returnflag"), col("bin"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  private val aHistogramSql =
    s"""WITH counts AS (
       |  SELECT l_returnflag,
       |    CAST(LEAST(floor(l_extendedprice / 80000.0 * $aHistogramBins),
       |      ${aHistogramBins - 1}) AS INT) AS bin,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM lineitem GROUP BY 1, 2),
       |spine AS (
       |  SELECT DISTINCT l_returnflag, CAST(i AS INT) AS bin
       |  FROM lineitem, unnest(generate_series(0, ${aHistogramBins - 1})) g(i))
       |SELECT s.l_returnflag, s.bin, coalesce(c.n, CAST(0 AS BIGINT)) AS n
       |FROM spine s LEFT JOIN counts c
       |  ON s.l_returnflag = c.l_returnflag AND s.bin = c.bin""".stripMargin

  /** Per-group OLS regression (price-vs-quantity slope per supplier
    * nation): the decomposable-sums shape — one partial-aggregated
    * shuffle carries five exact sums, and slope/intercept fall out of
    * one deterministic double expression per group. Exactness AND
    * speed via the a_moments trick: quantity is integral and price is
    * 2-decimal (measured), so the sums run in codegen'd LONG space
    * (q, p·100, q·p·100, q²) — ~4× faster than the decimal(38,6)
    * path — and the ×100 scales divide out in the final expression.
    * Long-sum headroom: |q·p100| ≤ 5e8/row → overflows past ~2e10
    * rows per group; beyond that, widen the partials to
    * decimal(38,0) (same exactness, no codegen). */
  private val aGroupOls: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val sup = table(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val q = col("l_quantity").cast("long")
    val p100 = round(col("l_extendedprice") * 100, 0).cast("long")
    val g = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(q).cast("double").as("sx"),
        (sum(p100).cast("double") / lit(100.0)).as("sy"),
        (sum(q * p100).cast("double") / lit(100.0)).as("sxy"),
        sum(q * q).cast("double").as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    g.select(col("s_nationkey"), slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
  }

  private val aGroupOlsSql =
    s"""WITH g AS (
       |  SELECT s_nationkey,
       |    CAST(count(*) AS DOUBLE) AS n,
       |    CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sx,
       |    CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sy,
       |    CAST(CAST(sum(CAST(l_quantity AS BIGINT) *
       |      CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sxy,
       |    CAST(CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sxx
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1)
       |SELECT s_nationkey,
       |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
       |FROM g""".stripMargin

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next = b | current = a). One shuffle for the lead
    * window, one partial-agg shuffle for the pair counts; the
    * row-normalizing total rides a second window on the SMALL
    * transition matrix, not the events. */
  private val aMarkovTransitions: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cur"))
    events(s, d)
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_trans",
        col("n_trans").cast("double") /
          sum(col("n_trans")).over(wRow).cast("double"))
  }

  private val aMarkovTransitionsSql =
    s"""WITH seq AS (
       |  SELECT event_type, lead(event_type) OVER (
       |    PARTITION BY user_id ORDER BY $evUsSql, event_id) AS nxt
       |  FROM events),
       |m AS (
       |  SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS n_trans
       |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
       |SELECT cur, nxt, n_trans,
       |  CAST(n_trans AS DOUBLE) /
       |    CAST(sum(n_trans) OVER (PARTITION BY cur) AS DOUBLE) AS p_trans
       |FROM m""".stripMargin

  /** Gap-threshold sessionization (ops.Sessionize): 30-minute
    * inactivity gap cuts each user's event stream into sessions;
    * per-session rollup. Both windows ride one shuffle on user_id. */
  private val sessionGapUs = 30L * 60 * 1000 * 1000
  private val aSessionize: Q = (s, d) =>
    graft.ops.Sessionize.sessions(events(s, d), sessionGapUs)

  private val aSessionizeSql =
    graft.ops.Sessionize.sessionsSql(sessionGapUs, evUsSql)

  /** Event-level session features: each event tagged with its session
    * ordinal, position within the session, and microseconds since the
    * session started — the per-event join-back a feature pipeline
    * derives after sessionization. The session-id running sum rides
    * the user_id shuffle; the session-scoped position/start windows
    * re-sort within the (user, session) refinement of the same
    * partitioning. */
  private val wSessionFeatures: Q = (s, d) => {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val bySession = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ev_us"), col("event_id"))
    events(s, d)
      .withColumn("is_start",
        when(col("ev_us") - lag(col("ev_us"), 1).over(byUser) <= sessionGapUs,
          lit(0L)).otherwise(lit(1L)))
      .withColumn("session_id", sum(col("is_start")).over(
        byUser.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("pos_in_session",
        row_number().over(bySession).cast("long"))
      .withColumn("us_into_session",
        col("ev_us") - min(col("ev_us")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("session_id"))))
      .select(col("event_id"), col("user_id"), col("session_id"),
        col("pos_in_session"), col("us_into_session"))
  }

  private val wSessionFeaturesSql =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, $evUsSql AS us FROM events),
       |flagged AS (
       |  SELECT event_id, user_id, us,
       |    CASE WHEN us - lag(us) OVER w <= $sessionGapUs THEN 0 ELSE 1 END AS is_start
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sess AS (
       |  SELECT event_id, user_id, us,
       |    sum(is_start) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged)
       |SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id,
       |  CAST(row_number() OVER (PARTITION BY user_id, session_id
       |    ORDER BY us, event_id) AS BIGINT) AS pos_in_session,
       |  us - min(us) OVER (PARTITION BY user_id, session_id) AS us_into_session
       |FROM sess""".stripMargin

  /** Two-phase salted aggregation (ops.SkewOps): the hot-key guard for
    * skewed GROUP BY at 100 TB — each key is split across 16 salt
    * buckets for the partial agg, then merged. The oracle is the PLAIN
    * group-by: salting must be invisible in the result. Only
    * re-aggregation-exact functions are gated (count, integer sum,
    * min/max — double sums would reorder). */
  private val aSaltedAgg: Q = (s, d) =>
    graft.ops.SkewOps.saltedAgg(
      table(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"),
      buckets = 16,
      aggs = Map(
        "n_lines" -> ("l_orderkey", "count"),
        "sum_linenumber" -> ("l_linenumber", "sum"),
        "min_qty" -> ("l_quantity", "min"),
        "max_price" -> ("l_extendedprice", "max")))

  private val aSaltedAggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(l_orderkey) AS BIGINT) AS n_lines,
      |  CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumber,
      |  min(l_quantity) AS min_qty,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Bloom-pruned fact⋈dim join (ops.BloomJoin): rich MACHINERY
    * customers prune the orders scan before the shuffle; result must
    * equal the plain join (no false negatives; fpp survivors die in
    * the join). */
  private val jBloomPruned: Q = (s, d) => {
    val rich = table(s, d, "customer")
      .filter(col("c_mktsegment") === "MACHINERY" && col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    graft.ops.BloomJoin.pruned(
        table(s, d, "orders"), rich, "o_custkey", "c_custkey",
        expected = 4096)
      .select(col("o_orderkey"), col("o_custkey"), col("c_acctbal"))
  }

  private val jBloomPrunedSql =
    """SELECT o_orderkey, o_custkey, c_acctbal
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 9000""".stripMargin

  /** Retention cohorts — the standard product-analytics rollup: users
    * grouped by first-seen week (cohort), counted as active per weeks
    * -since-cohort offset. Two aggregations: first-seen per user (one
    * shuffle on user), then distinct users per (cohort, offset) — the
    * shape that scales because everything keys on user or on the tiny
    * (cohort, offset) pair, never on raw events. */
  private val aRetentionCohorts: Q = (s, d) => {
    val ev = events(s, d)
      .select(col("user_id"), expr("ev_us div 604800000000").as("week"))
    val firstSeen = ev.groupBy("user_id")
      .agg(min(col("week")).as("cohort_week"))
    ev.join(firstSeen, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  private val aRetentionCohortsSql =
    s"""WITH ev AS (
       |  SELECT user_id, $evUsSql // 604800000000 AS week FROM events),
       |first_seen AS (
       |  SELECT user_id, CAST(min(week) AS BIGINT) AS cohort_week
       |  FROM ev GROUP BY 1)
       |SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
       |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
       |FROM ev e JOIN first_seen f USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  /** Latest-state-per-key compaction (the CDC / changelog pattern —
    * batch form of what LiveMerge keeps in stream state): the newest
    * event per user by (event time, unique id tiebreak). One window
    * per key shard; at scale this is the standard log-compaction
    * query. */
  private val streamLatestState: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ev_us").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ev_us"),
        col("event_type"), col("value"))
  }

  private val streamLatestStateSql =
    s"""SELECT user_id, event_id, $evUsSql AS ev_us, event_type, value
       |FROM events
       |QUALIFY row_number() OVER (PARTITION BY user_id
       |        ORDER BY $evUsSql DESC, event_id DESC) = 1""".stripMargin

  /** Stream-static enrichment (batch form of StreamOps.staticEnrich):
    * events broadcast-join the customer→nation dim, hourly rollup per
    * nation. The streaming form is MemoryStream-parity-tested in
    * StreamOpsSpec. */
  private val streamStaticEnrich: Q = (s, d) => {
    val dim = table(s, d, "customer")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
      .join(table(s, d, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("user_id"), col("n_name"))
    graft.streaming.StreamOps.staticEnrich(
      events(s, d), dim, "user_id", "n_name", watermarked = false)
  }

  private val streamStaticEnrichSql =
    s"""SELECT ($evUsSql // 3600000000) * 3600000000 AS window_start_us,
       |  n.n_name, CAST(COUNT(*) AS BIGINT) AS n,
       |  ${dsumSql("e.value")} AS total_value
       |FROM events e
       |JOIN customer c ON e.user_id = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY 1, 2""".stripMargin

  private val streamTumbling: Q = (s, d) =>
    events(s, d)
      .groupBy(expr("ev_us div 3600000000").as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  private val streamTumblingSql =
    s"""SELECT $evUsSql // 3600000000 AS hour_bucket, event_type,
       |COUNT(*) AS n, ${dsumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Session windows (gap-based), batch form of the streaming
    * sessionization — Spark's native session_window (a session closes
    * when no event lands within the gap; an event at exactly last+gap
    * starts a NEW session). Oracle: gaps-and-islands with the same
    * >= gap boundary. */
  private val streamSession: Q = (s, d) =>
    graft.streaming.StreamOps.sessionCounts(events(s, d), watermarked = false)

  private val streamSessionSql = {
    val gapUs = 1800000000L // 30 minutes
    s"""WITH e AS (SELECT event_type, $evUsSql AS us, value FROM events),
       |f AS (SELECT *, CASE WHEN us - lag(us) OVER
       |  (PARTITION BY event_type ORDER BY us) >= $gapUs
       |  THEN 1 ELSE 0 END AS new_s FROM e),
       |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY event_type ORDER BY us
       |  ROWS UNBOUNDED PRECEDING) AS sid FROM f)
       |SELECT MIN(us) AS session_start_us, MAX(us) + $gapUs AS session_end_us,
       |  event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
       |FROM g GROUP BY event_type, sid""".stripMargin
  }

  /** Interval (attribution) join, batch form of the stream-stream
    * join: purchases within 2 h after a view, per user. */
  private val streamIntervalJoin: Q = (s, d) => {
    val e = events(s, d)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ev_ts").as("view_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ev_ts").as("purchase_ts"), col("value").as("purchase_value"))
    graft.streaming.StreamOps.attributionJoin(v, p, watermarked = false)
  }

  private val streamIntervalJoinSql =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |  $evUsSql AS us, value FROM events)
       |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       |  p.us - v.us AS lag_us, p.value AS purchase_value
       |FROM e v JOIN e p ON v.user_id = p.user_id
       |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
       |AND p.us >= v.us AND p.us <= v.us + 7200000000""".stripMargin

  /** Gap-filling by linear interpolation — the time-series imputation
    * op (sensor dropout, missed heartbeat): null values take the
    * time-weighted lerp of their nearest non-null neighbors within the
    * user's timeline. Planted nulls (event_id % 7) make the gate
    * deterministic. Two IGNORE-NULLS windows ride ONE user shuffle.
    *
    * Exactness: the lerp runs ENTIRELY in integers — centi-unit
    * values (the ×100 currency, events.value is exact 2-decimal),
    * microsecond times, numerator v₀·(t₁−t) + v₁·(t−t₀) ≤ ~5e14 in
    * long, integral `div` by (t₁−t₀) (all terms nonnegative, so
    * truncating ≡ floor in both engines). A double lerp + round(6)
    * would sit exactly on the quotient-boundary hazard the mean-pool
    * gate hit — synthetic timestamps make t-ratios nice rationals
    * that land ON .5 grid lines. */
  private val wInterpolateGaps: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ev_us"), col("event_id"))
    val before = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    events(s, d)
      .withColumn("v_obs",
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      .withColumn("vq", round(col("v_obs") * 100, 0).cast("long"))
      .withColumn("prev_vq", last(col("vq"), ignoreNulls = true).over(before))
      .withColumn("prev_us",
        last(when(col("vq").isNotNull, col("ev_us")), ignoreNulls = true).over(before))
      .withColumn("next_vq", first(col("vq"), ignoreNulls = true).over(after))
      .withColumn("next_us",
        first(when(col("vq").isNotNull, col("ev_us")), ignoreNulls = true).over(after))
      .withColumn("filled_q",
        when(col("vq").isNotNull, col("vq"))
          .when(col("prev_vq").isNotNull && col("next_vq").isNotNull,
            expr("""(prev_vq * (next_us - ev_us) + next_vq * (ev_us - prev_us))
                   | div (next_us - prev_us)""".stripMargin))
          .otherwise(lit(null).cast("long")))
      .select(col("event_id"), col("user_id"), col("v_obs"), col("filled_q"),
        (col("v_obs").isNull && col("filled_q").isNotNull).as("interpolated"))
  }

  private val wInterpolateGapsSql =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, $evUsSql AS us,
       |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v_obs
       |  FROM events),
       |q AS (
       |  SELECT event_id, user_id, us, v_obs,
       |    CAST(round(v_obs * 100, 0) AS BIGINT) AS vq FROM ev),
       |nb AS (
       |  SELECT event_id, user_id, us, v_obs, vq,
       |    LAST_VALUE(vq IGNORE NULLS) OVER wb AS prev_vq,
       |    LAST_VALUE(CASE WHEN vq IS NOT NULL THEN us END IGNORE NULLS)
       |      OVER wb AS prev_us,
       |    FIRST_VALUE(vq IGNORE NULLS) OVER wa AS next_vq,
       |    FIRST_VALUE(CASE WHEN vq IS NOT NULL THEN us END IGNORE NULLS)
       |      OVER wa AS next_us
       |  FROM q WINDOW
       |    wb AS (PARTITION BY user_id ORDER BY us, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    wa AS (PARTITION BY user_id ORDER BY us, event_id
       |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
       |SELECT event_id, user_id, v_obs,
       |  CASE WHEN vq IS NOT NULL THEN vq
       |       WHEN prev_vq IS NOT NULL AND next_vq IS NOT NULL THEN
       |         (prev_vq * (next_us - us) + next_vq * (us - prev_us))
       |           // (next_us - prev_us)
       |       ELSE NULL END AS filled_q,
       |  (v_obs IS NULL AND (vq IS NOT NULL OR
       |    (prev_vq IS NOT NULL AND next_vq IS NOT NULL))) AS interpolated
       |FROM nb""".stripMargin

  /** Exact mode per group with a total tie-break (highest count, then
    * smallest value) — the categorical-imputation statistic. The
    * corpus collapses to (user, value) counts in one partial-
    * aggregated shuffle; the rank window then runs over that small
    * table on the SAME user key (exchange reused, no second corpus
    * shuffle). */
  private val aMode: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("event_type"))
    events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_v"),
        col("c").as("mode_n"))
  }

  private val aModeSql =
    s"""WITH c AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2)
       |SELECT user_id, event_type AS mode_v, c AS mode_n FROM (
       |  SELECT user_id, event_type, c,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY c DESC, event_type) AS rn
       |  FROM c) t
       |WHERE rn = 1""".stripMargin

  /** Winsorization — clamp each value into its group's [p05, p95]
    * (the heavy-tail taming transform that keeps the row, unlike the
    * MAD gate which flags it). Boundaries from the exact builtin
    * percentile (≡ quantile_cont, a_percentiles anchor), broadcast
    * back; clamping is two comparisons per row. */
  private val pWinsorize: Q = (s, d) => {
    val ev = events(s, d)
    val bounds = ev.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.05)").as("lo"),
      expr("percentile(value, 0.95)").as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(least(greatest(col("value"), col("lo")), col("hi")), 6)
          .as("winsorized"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clamped"))
  }

  private val pWinsorizeSql =
    """WITH b AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.05) AS lo,
      |    quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6) AS winsorized,
      |  (e.value < b.lo OR e.value > b.hi) AS clamped
      |FROM events e JOIN b ON e.event_type = b.event_type""".stripMargin

  /** Interval-union coverage per user — merge overlapping [start, end)
    * intervals (each event opens a 5-minute activity window) and
    * report the union's total length and merged-interval count: the
    * "how much wall-clock was the user actually active" stat that
    * naive SUM(duration) double-counts. Classic sweep: an interval
    * starts a new merged run iff its start exceeds the running max of
    * prior ends — two windows riding ONE user-key shuffle (the
    * sessionize/islands shape). */
  private val intervalLenUs = 300000000L // 5 min
  private val aIntervalUnion: Q = (s, d) => {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
    val run = byUser.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ev_us").as("st"),
        (col("ev_us") + intervalLenUs).as("en"))
      .withColumn("prev_max_en", max(col("en")).over(run))
      .withColumn("is_new",
        when(col("prev_max_en").isNull ||
          col("st") > col("prev_max_en"), 1L).otherwise(0L))
      // clip each interval's NET contribution to the union at its
      // left edge: max(en, prev_max_en) - max(st, prev_max_en)
      .withColumn("contrib",
        greatest(col("en"), coalesce(col("prev_max_en"), col("st"))) -
          greatest(col("st"), coalesce(col("prev_max_en"), col("st"))))
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n_merged"),
        sum(col("contrib")).as("covered_us"),
        count(lit(1)).as("n_events"))
  }

  private val aIntervalUnionSql =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, $evUsSql AS st,
       |    $evUsSql + $intervalLenUs AS en
       |  FROM events),
       |sweep AS (
       |  SELECT user_id, st, en,
       |    MAX(en) OVER (PARTITION BY user_id ORDER BY st, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_en
       |  FROM iv)
       |SELECT user_id,
       |  CAST(SUM(CASE WHEN prev_max_en IS NULL OR st > prev_max_en
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
       |  CAST(SUM(GREATEST(en, COALESCE(prev_max_en, st)) -
       |    GREATEST(st, COALESCE(prev_max_en, st))) AS BIGINT) AS covered_us,
       |  CAST(COUNT(*) AS BIGINT) AS n_events
       |FROM sweep GROUP BY 1""".stripMargin

  /** Feature scaling per group — the ML-prep transform every tabular
    * training pipeline runs: z-score ((x−μ)/σ) and min-max
    * ((x−min)/(max−min)) per event_type. μ and σ come from
    * decimal-exact Σx / Σx² (one partial-aggregated pass over the
    * group; population σ via E[x²]−μ², sqrt is deterministic IEEE),
    * broadcast back onto the rows — two scans, one tiny join, no
    * window over the corpus. */
  private val pFeatureScale: Q = (s, d) => {
    val ev = events(s, d)
    val stats = ev.groupBy(col("event_type")).agg(
      dsum(col("value")).as("s1"),
      dsum(col("value") * col("value")).as("s2"),
      count(lit(1)).as("n"),
      min(col("value")).as("mn"),
      max(col("value")).as("mx"))
      .withColumn("mu", col("s1") / col("n").cast("double"))
      .withColumn("sigma", sqrt(greatest(
        col("s2") / col("n").cast("double") - col("mu") * col("mu"),
        lit(0.0))))
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mu")) / col("sigma"), 6).as("z"),
        round((col("value") - col("mn")) / (col("mx") - col("mn")), 6).as("mm"))
  }

  private val pFeatureScaleSql =
    s"""WITH stats AS (
       |  SELECT event_type,
       |    ${dsumSql("value")} AS s1,
       |    ${dsumSql("value * value")} AS s2,
       |    CAST(count(*) AS BIGINT) AS n,
       |    MIN(value) AS mn, MAX(value) AS mx
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT event_type, s1 / CAST(n AS DOUBLE) AS mu,
       |    sqrt(GREATEST(s2 / CAST(n AS DOUBLE) -
       |      (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)),
       |      CAST(0 AS DOUBLE))) AS sigma,
       |    mn, mx
       |  FROM stats)
       |SELECT e.event_id, e.event_type, e.value,
       |  ROUND((e.value - m.mu) / m.sigma, 6) AS z,
       |  ROUND((e.value - m.mn) / (m.mx - m.mn), 6) AS mm
       |FROM events e JOIN m ON e.event_type = m.event_type""".stripMargin

  /** Exact quartile bucketing per group — the quantile-discretizer
    * transform: boundaries from the builtin exact `percentile`
    * (≡ DuckDB quantile_cont bit-for-bit, anchored by the
    * a_percentiles gate), assignment by comparison — a broadcast of
    * groups×3 boundary rows, never a corpus sort at assignment time. */
  private val pQuantileBucket: Q = (s, d) => {
    val ev = events(s, d)
    val bounds = ev.groupBy(col("event_type")).agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.5)").as("q2"),
      expr("percentile(value, 0.75)").as("q3"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        (lit(1) + when(col("value") > col("q1"), 1).otherwise(0)
          + when(col("value") > col("q2"), 1).otherwise(0)
          + when(col("value") > col("q3"), 1).otherwise(0)).as("bucket"))
  }

  private val pQuantileBucketSql =
    """WITH b AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.25) AS q1,
      |    quantile_cont(value, 0.5) AS q2,
      |    quantile_cont(value, 0.75) AS q3
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  1 + (CASE WHEN e.value > b.q1 THEN 1 ELSE 0 END)
      |    + (CASE WHEN e.value > b.q2 THEN 1 ELSE 0 END)
      |    + (CASE WHEN e.value > b.q3 THEN 1 ELSE 0 END) AS bucket
      |FROM events e JOIN b ON e.event_type = b.event_type""".stripMargin

  /** Batch form of the LEFT OUTER stream-stream attribution join —
    * unconverted views null-padded (streaming twin emits them when the
    * watermark passes view_ts + maxLag; StreamOpsSpec drives that). */
  private val streamIntervalJoinOuter: Q = (s, d) => {
    val e = events(s, d)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ev_ts").as("view_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ev_ts").as("purchase_ts"), col("value").as("purchase_value"))
    graft.streaming.StreamOps.attributionJoinOuter(v, p, watermarked = false)
  }

  private val streamIntervalJoinOuterSql =
    s"""WITH e AS (SELECT event_id, user_id, event_type,
       |  $evUsSql AS us, value FROM events),
       |v AS (SELECT user_id, event_id AS view_id, us FROM e WHERE event_type = 'view'),
       |p AS (SELECT user_id, event_id AS purchase_id, us, value FROM e
       |      WHERE event_type = 'purchase')
       |SELECT v.user_id, v.view_id, p.purchase_id,
       |  p.us - v.us AS lag_us, p.value AS purchase_value,
       |  p.purchase_id IS NOT NULL AS converted
       |FROM v LEFT JOIN p ON v.user_id = p.user_id
       |  AND p.us >= v.us AND p.us <= v.us + 7200000000""".stripMargin

  /** Exact multi-percentile aggregation (type-7 linear interpolation,
    * identical to Spark `percentile` and DuckDB `quantile_cont` —
    * anchored in PercentileSpec). Computed via pre-aggregation: a
    * codegen'd hash-agg collapses rows to (group, value, weight), the
    * interpolation then runs over the small distinct-value table — at
    * any scale the heavy pass is one partial+final count, not per-row
    * percentile-buffer updates (4x faster than the builtin at sf0.1,
    * and the shuffle carries distinct values, not rows). */
  private val aPercentiles: Q = (s, d) => {
    val pcts = Seq(0.25 -> "p25", 0.5 -> "p50", 0.95 -> "p95")
    val counts = table(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    // each distinct value covers the 0-based row-index range
    // [cum_start, cum_end) of the sorted group
    val ranged = counts
      .withColumn("cum_end", sum(col("c")).over(w))
      .withColumn("cum_start", col("cum_end") - col("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"))))
    def at(idx: org.apache.spark.sql.Column) =
      max(when(col("cum_start") <= idx && idx < col("cum_end"),
        col("l_extendedprice")))
    val aggs = pcts.flatMap { case (p, name) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      Seq(at(floor(pos).cast("long")).as(s"${name}_lo"),
        at(ceil(pos).cast("long")).as(s"${name}_hi"),
        max(pos - floor(pos)).as(s"${name}_frac"),
        max(ceil(pos) - pos).as(s"${name}_cfrac"))
    } :+ max(col("n")).as("n_rows")
    // exact weighted form (hi-pos)*v_lo + (pos-lo)*v_hi — the builtin
    // percentile's (and quantile_cont's) FP evaluation order; the
    // algebraically-equal v_lo + (v_hi-v_lo)*frac differs by 1 ULP
    val lerped = pcts.foldLeft(
      ranged.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)) {
      case (df, (_, name)) =>
        df.withColumn(name,
          when(col(s"${name}_frac") === 0.0, col(s"${name}_lo"))
            .otherwise(col(s"${name}_cfrac") * col(s"${name}_lo") +
              col(s"${name}_frac") * col(s"${name}_hi")))
    }
    lerped.select(col("l_returnflag"), col("p25"), col("p50"), col("p95"),
      col("n_rows"))
  }

  private val aPercentilesSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS p25,
      |  quantile_cont(l_extendedprice, 0.5) AS p50,
      |  quantile_cont(l_extendedprice, 0.95) AS p95,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Percentiles at unbounded value cardinality: the GK-sketch
    * approx_percentile — one pass, mergeable, bounded memory regardless
    * of distinct-value count (the exact pre-aggregated form needs the
    * distinct values to fit the agg hash table). Rows-only in the gate
    * (sketch internals differ across engines); PercentileSpec bounds
    * the error against the exact values. Output is flattened to scalar
    * columns (the correctness driver's compare can't hash arrays). */
  private val aPercentilesApprox: Q = (s, d) =>
    table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.95), 1000)")
          .as("pcts_approx"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        element_at(col("pcts_approx"), 1).as("p25_approx"),
        element_at(col("pcts_approx"), 2).as("p50_approx"),
        element_at(col("pcts_approx"), 3).as("p95_approx"),
        col("n_rows"))

  /** A4 at 100 TB: exact countDistinct replaced with HLL sketches —
    * one pass, mergeable, no distinct shuffle. Rows-only in the gate
    * (HLL implementations differ across engines); the ScalaTest
    * tolerance check against the exact counts is the correctness
    * evidence. */
  private val a4Approx: Q = (s, d) =>
    table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("n_parts_approx"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("n_supps_approx"),
        count(lit(1)).as("n_rows"))

  /** Pre-aggregated distinct rollup: per-priority HLL sketches of the
    * customer key, estimated off the STORED sketches (the persistable
    * incremental-agg pattern; union ≡ single-pass anchored in
    * SketchRollupSpec). Deterministic → rows gate. */
  private val aHllPartial: Q = (s, d) =>
    graft.ops.SketchRollup.estimates(
      graft.ops.SketchRollup.partialSketches(
        table(s, d, "orders"), "o_orderpriority", "o_custkey"),
      "o_orderpriority")

  /** The graft-KERNEL HLL (ops.HllKernel) — unlike a_hll_partial's
    * DataSketches library seam, every piece here is a graft kernel
    * with a DuckDB spelling: xxhash64 registers, integer raw
    * estimator, fixed-point-log2 linear counting. Full hash oracle —
    * the sketch VALUE path, not just an exact sibling. Distinct
    * users per event type at 100 TB: one scan, two-level agg,
    * register-max merge ≡ rebuild bit-identically. */
  private val aHllKernel: Q = (s, d) =>
    graft.ops.HllKernel.estimate(events(s, d), "event_type", "user_id")

  private val aHllKernelSql = graft.ops.HllKernel.estimateSql()

  /** Integer log-linear quantile sketch (ops.HdrHistogram) — the
    * mergeable, bounded-state percentile path whose WHOLE state +
    * estimator replays in the oracle (vs a_percentiles_approx's
    * engine-internal GK compress). Price cents enter by
    * floor(x·100) — one IEEE multiply then floor, deterministic on
    * both engines (the double→int casting gotcha in SKILL.md). */
  private val aHdrQuantiles: Q = (s, d) =>
    graft.ops.HdrHistogram.quantiles(
      table(s, d, "lineitem").select(col("l_returnflag"),
        expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("x")),
      "l_returnflag", "x", k = 5, Seq(500, 900, 990))

  private val aHdrQuantilesSql = graft.ops.HdrHistogram.quantilesSql(
    "SELECT l_returnflag, CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS x FROM lineitem",
    "l_returnflag", k = 5, Seq(500, 900, 990))

  /** KMV bottom-k sketch with set-algebra estimation (ops.KmvSketch):
    * distinct-user overlap between two event types estimated from two
    * 256-value sketches — the cross-shard audience-overlap primitive
    * HLL cannot answer. Bounded MinKAgg aggregation (map-side
    * combined), union re-sketch from the sketches alone, one
    * estimator formula covering both the exact (non-full) and
    * order-statistic regimes. Full hash oracle via the staged
    * xxhash64 CTEs. */
  private val aKmvIntersect: Q = (s, d) =>
    graft.ops.KmvSketch.intersectEstimate(
      events(s, d), "event_type", "user_id", "view", "click")

  private val aKmvIntersectSql = graft.ops.KmvSketch.intersectEstimateSql()

  /** Rolling 7-day percentiles from persisted daily HDR histograms
    * (ops.HdrHistogram.rollingQuantiles) — the sketch merge in the
    * time dimension: any trailing-window p50/p99 from count addition
    * over the daily bucket rows, never a raw rescan. Everything
    * after the one scan runs on histogram-sized frames. */
  private val wHdrRolling: Q = (s, d) =>
    graft.ops.HdrHistogram.rollingQuantiles(
      events(s, d).select(expr("ev_us div 86400000000").as("day"),
        expr("CAST(FLOOR(value * 1000000.0) AS BIGINT)").as("x")),
      "day", "x", k = 5, windowDays = 7, Seq(500, 990))

  private val wHdrRollingSql = graft.ops.HdrHistogram.rollingQuantilesSql(
    s"""SELECT ($evUsSql) // 86400000000 AS day,
       |  CAST(FLOOR("value" * 1000000.0) AS BIGINT) AS x FROM events""".stripMargin,
    k = 5, windowDays = 7, Seq(500, 990))

  /** The kernel-HLL INCREMENTAL rollup (a_hll_partial's architecture,
    * hash-exact): hourly register rows — what a pipeline persists per
    * ingest batch — max-merged to daily estimates; the oracle replays
    * the same hour→day merge path, so the "rollup of stored sketches
    * ≡ daily rescan" claim is in the artifact, not just the spec.
    * Exact daily distinct joins in as the error witness. */
  private val aHllRollup: Q = (s, d) => {
    val ev = events(s, d).withColumn("hour_id", expr("ev_us div 3600000000"))
    val est = graft.ops.HllKernel.rollupEstimate(ev, "hour_id", "user_id")
    val exact = events(s, d).filter(col("user_id").isNotNull)
      .groupBy(expr("ev_us div 86400000000").as("day_id"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(broadcast(exact), Seq("day_id"))
  }

  private val aHllRollupSql = graft.ops.HllKernel.rollupEstimateSql(
    hourSql = s"($evUsSql) // 3600000000")

  /** Salted equi-join (ops.SkewOps.saltedJoin): the skewed-JOIN twin of
    * a_salted_agg — fact rows carry a deterministic hash salt, the dim
    * side is replicated 8×, the join keys on (suppkey, salt) so a hot
    * supplier spreads over 8 reducers. merge hint forces the
    * sort-merge path (a broadcast would bypass the machinery under
    * test). The oracle is the PLAIN join + group-by: salting must be
    * invisible. Quantity sum via the decimal-exact dsum. */
  private val jSkewSalted: Q = (s, d) =>
    graft.ops.SkewOps.saltedJoin(
        table(s, d, "lineitem").hint("merge"),
        table(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        "l_suppkey", "s_suppkey", buckets = 8,
        saltOn = Seq("l_orderkey", "l_linenumber"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))

  private val jSkewSaltedSql =
    s"""SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_lines,
       |  ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1""".stripMargin

  /** OHLC time-bucket downsample (ops.Ohlc): per (user, hour) open/
    * high/low/close of the event value — the fixed-footprint lossy
    * resample for dense telemetry series. One shuffle; open/close ride
    * min_by/max_by on a (ts, event_id) ordering struct, so no window
    * and no sort. All outputs are selections of stored doubles →
    * bit-exact oracle. */
  private val wResampleOhlc: Q = (s, d) =>
    graft.ops.Ohlc.resample(events(s, d), Seq("user_id"),
      tsCol = "ev_us", tieCol = "event_id", valCol = "value",
      bucketWidth = 3600000000L)

  private val wResampleOhlcSql = graft.ops.Ohlc.resampleSql(
    s"SELECT user_id, event_id, value, $evUsSql AS us FROM events",
    keys = Seq("user_id"), tsSql = "us", tieSql = "event_id",
    valSql = "value", bucketWidth = 3600000000L)

  /** Full outer join with key coalescing: per-nation customer counts ⟗
    * per-nation supplier counts — nations present on only one side
    * survive with a 0 on the other (at sf0.001 supplier covers 10 of
    * 25 nations, so the outer rows are real). USING-style join keeps
    * one nationkey column. */
  private val jFullCoalesce: Q = (s, d) => {
    val cust = table(s, d, "customer")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val supp = table(s, d, "supplier")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    cust.join(supp, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  private val jFullCoalesceSql =
    """SELECT nationkey,
      |  CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
      |  CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
      |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
      |      FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      |      FROM supplier GROUP BY 1) s USING (nationkey)""".stripMargin

  /** Key-skew profile (ops.KeySkew): hottest-key share + Gini of the
    * key-frequency distribution for two prospective shuffle keys — the
    * pre-flight diagnostic that decides whether SkewOps salting is
    * needed. All-integer Gini rank formula → bit-exact oracle. */
  private val qualityKeySkew: Q = (s, d) =>
    graft.ops.KeySkew.profile(events(s, d), "event_type")
      .unionByName(graft.ops.KeySkew.profile(table(s, d, "lineitem"),
        "l_suppkey"))

  private val qualityKeySkewSql =
    s"""${graft.ops.KeySkew.profileSql("SELECT * FROM events", "event_type")}
       |UNION ALL
       |${graft.ops.KeySkew.profileSql("SELECT * FROM lineitem", "l_suppkey")}""".stripMargin

  /** Referential-integrity audit (sources.IntegrityAudit): orphan-FK
    * counts for three declared relationships — two clean, one against
    * a deliberately truncated parent snapshot (suppliers with suppkey
    * divisible by 10 dropped) so nonzero orphan accounting is
    * exercised, not just the zero path. */
  private val qualityRefIntegrity: Q = (s, d) => {
    import graft.sources.IntegrityAudit.{Relation, audit}
    audit(Seq(
      Relation("lineitem->orders", table(s, d, "lineitem"), "l_orderkey",
        table(s, d, "orders"), "o_orderkey"),
      Relation("events->customer", events(s, d), "user_id",
        table(s, d, "customer"), "c_custkey"),
      Relation("lineitem->supplier_truncated", table(s, d, "lineitem"),
        "l_suppkey",
        table(s, d, "supplier").filter(col("s_suppkey") % 10 =!= 0),
        "s_suppkey")))
  }

  private val qualityRefIntegritySql = {
    import graft.sources.IntegrityAudit.relationSql
    Seq(
      relationSql("lineitem->orders", "SELECT * FROM lineitem", "l_orderkey",
        "SELECT * FROM orders", "o_orderkey"),
      relationSql("events->customer", "SELECT * FROM events", "user_id",
        "SELECT * FROM customer", "c_custkey"),
      relationSql("lineitem->supplier_truncated", "SELECT * FROM lineitem",
        "l_suppkey", "SELECT * FROM supplier WHERE s_suppkey % 10 <> 0",
        "s_suppkey")
    ).mkString("\nUNION ALL\n")
  }

  /** S2 upsert MERGE semantics as a direct oracle gate (previously
    * ScalaTest-only — the one external seam whose ALGEBRA is fully
    * SQL-expressible): updates win per key, untouched rows survive,
    * brand-new keys insert. Updates = every 7th supplier renamed and
    * re-balanced plus synthetic new keys from every 11th; engine runs
    * [[graft.sources.Dims.upsert]] (full-outer + per-column coalesce,
    * 1:1 with Delta MERGE INTO), oracle spells the same algebra. */
  private val s2UpsertMerge: Q = (s, d) => {
    val sup = table(s, d, "supplier")
    val existing = sup.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val updates = sup.where(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey"),
        concat(lit("UPD_"), col("s_suppkey").cast("string")).as("s_name"),
        col("s_nationkey"),
        (col("s_acctbal") + 1000.0).as("s_acctbal"))
      .unionByName(sup.where(col("s_suppkey") % 11 === 0)
        .select((col("s_suppkey") + 100000L).as("s_suppkey"),
          concat(lit("NEW_"), col("s_suppkey").cast("string")).as("s_name"),
          col("s_nationkey"), lit(0.0).as("s_acctbal")))
    graft.sources.Dims.upsert(existing, updates, Seq("s_suppkey"))
  }

  private val s2UpsertMergeSql =
    """WITH existing AS (
      |  SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier),
      |upd AS (
      |  SELECT s_suppkey, 'UPD_' || CAST(s_suppkey AS VARCHAR) AS s_name,
      |         s_nationkey, s_acctbal + 1000.0 AS s_acctbal
      |  FROM supplier WHERE s_suppkey % 7 = 0
      |  UNION ALL
      |  SELECT s_suppkey + 100000 AS s_suppkey,
      |         'NEW_' || CAST(s_suppkey AS VARCHAR) AS s_name,
      |         s_nationkey, CAST(0.0 AS DOUBLE) AS s_acctbal
      |  FROM supplier WHERE s_suppkey % 11 = 0)
      |SELECT COALESCE(u.s_suppkey, e.s_suppkey) AS s_suppkey,
      |       COALESCE(u.s_name, e.s_name) AS s_name,
      |       COALESCE(u.s_nationkey, e.s_nationkey) AS s_nationkey,
      |       COALESCE(u.s_acctbal, e.s_acctbal) AS s_acctbal
      |FROM existing e FULL OUTER JOIN upd u ON e.s_suppkey = u.s_suppkey""".stripMargin

  /** Privacy audit (sources.Privacy): k-anonymity + l-diversity per
    * quasi-identifier class on customer — (nation, segment) as the
    * quasi key, the $1000 account-balance band as the sensitive
    * attribute (floored BEFORE the bigint cast on both engines:
    * Spark cast truncates, DuckDB rounds). Output is bounded by quasi
    * cardinality, so enforcement broadcasts the verdicts back
    * (PrivacySpec) instead of windowing the corpus. */
  private val qualityKAnonymity: Q = (s, d) =>
    graft.sources.Privacy.kAnonymityAudit(
      table(s, d, "customer").withColumn("balance_band",
        floor(col("c_acctbal") / 1000).cast("long")),
      Seq("c_nationkey", "c_mktsegment"), "balance_band", k = 8)

  private val qualityKAnonymitySql =
    graft.sources.Privacy.kAnonymityAuditSql(
      """(SELECT c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS balance_band
        |  FROM customer)""".stripMargin,
      Seq("c_nationkey", "c_mktsegment"), "balance_band", k = 8)

  /** Z-order layout math (ops.ZOrder): Morton codes over two bounded
    * dimensions + the top-bits bucket a range-partitioned layout job
    * would write — per-bucket counts and z-extents, all integer bit
    * arithmetic so the oracle is exact. The write/pruning side
    * (disjoint per-file z-ranges) is asserted in ZOrderSpec. */
  private val oZorderCluster: Q = (s, d) =>
    events(s, d)
      .select(graft.ops.ZOrder.morton(
        col("user_id") % 1024, col("event_id") % 1024, 10).as("zv"))
      .groupBy(shiftright(col("zv"), 16).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zv")).as("z_min"), max(col("zv")).as("z_max"))

  private val oZorderClusterSql =
    s"""SELECT (zv >> 16) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(zv) AS z_min, MAX(zv) AS z_max
       |FROM (SELECT ${graft.ops.ZOrder.mortonSql(
            "user_id % 1024", "event_id % 1024", 10)} AS zv
       |      FROM events) t
       |GROUP BY 1""".stripMargin

  /** Global total-order rank WITHOUT a single-partition window
    * (ops.GlobalRank): order-preserving range buckets + per-bucket
    * offsets, ranks assigned under partitionBy(bucket). The oracle IS
    * the single-partition window — single-node DuckDB can afford what
    * a 1000-executor job cannot. */
  private val oGlobalRank: Q = (s, d) =>
    graft.ops.GlobalRank.withGlobalRank(
        events(s, d).select(col("event_id"), col("value")),
        "value", "event_id")
      .select(col("event_id"), col("value"), col("rn"))

  private val oGlobalRankSql = graft.ops.GlobalRank.rankSql(
    "SELECT event_id, value FROM events", "value", "event_id",
    "event_id, value")

  /** Exact join-cardinality pre-estimation (ops.JoinCardinality):
    * |A⋈B| = Σ f_A(k)·f_B(k) off the vocab-sized frequency tables —
    * the planner arithmetic run BEFORE an unaffordable join, paired
    * with quality_key_skew's salting diagnostic. Three relations: a
    * PK-FK join, a many-to-one, and a deliberately many-to-many pair
    * (events×events on user) whose blow-up the estimator must price. */
  private val qualityJoinCardinality: Q = (s, d) => {
    import graft.ops.JoinCardinality.{Relation, estimate}
    val ev = events(s, d)
    estimate(Seq(
      Relation("lineitem*orders", table(s, d, "lineitem"), "l_orderkey",
        table(s, d, "orders"), "o_orderkey"),
      Relation("lineitem*supplier", table(s, d, "lineitem"), "l_suppkey",
        table(s, d, "supplier"), "s_suppkey"),
      Relation("events*events_user", ev, "user_id", ev, "user_id")))
  }

  private val qualityJoinCardinalitySql = {
    import graft.ops.JoinCardinality.relationSql
    Seq(
      relationSql("lineitem*orders", "SELECT * FROM lineitem", "l_orderkey",
        "SELECT * FROM orders", "o_orderkey"),
      relationSql("lineitem*supplier", "SELECT * FROM lineitem", "l_suppkey",
        "SELECT * FROM supplier", "s_suppkey"),
      relationSql("events*events_user", "SELECT * FROM events", "user_id",
        "SELECT * FROM events", "user_id")
    ).mkString("\nUNION ALL\n")
  }

  /** Linear multi-touch attribution (ops.Attribution): each purchase's
    * value split equally across its preceding views in a 2 h window,
    * rolled up per view — the credit-splitting op a plain join cannot
    * express (the denominator is a per-purchase aggregate). */
  private val aAttributionLinear: Q = (s, d) => {
    val e = events(s, d)
    graft.ops.Attribution.linearCredit(
      e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ev_us").as("vus")),
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ev_us").as("pus"), col("value")),
      maxLagUs = 7200000000L)
  }

  private val aAttributionLinearSql = graft.ops.Attribution.linearCreditSql(
    s"SELECT user_id, event_id AS view_id, $evUsSql AS vus FROM events WHERE event_type = 'view'",
    s"SELECT user_id, event_id AS purchase_id, $evUsSql AS pus, value FROM events WHERE event_type = 'purchase'",
    maxLagUs = 7200000000L)

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("s4_scan_project", s4ScanProject, Some(s4ScanProjectSql)),
    ("a4_approx_distinct", a4Approx, None),
    ("a_hll_partial", aHllPartial, None),
    ("a_hll_kernel", aHllKernel, Some(aHllKernelSql)),
    ("a_hdr_quantiles", aHdrQuantiles, Some(aHdrQuantilesSql)),
    ("a_kmv_intersect", aKmvIntersect, Some(aKmvIntersectSql)),
    ("a_hll_kernel_rollup", aHllRollup, Some(aHllRollupSql)),
    ("stream_hll_distinct",
      ((s, d) => graft.streaming.StreamHll.distinctEstimatesBatch(
        events(s, d), "event_type", "user_id")): Q,
      Some(graft.streaming.StreamHll.distinctEstimatesBatchSql())),
    ("w_hdr_rolling_quantiles", wHdrRolling, Some(wHdrRollingSql)),
    ("a_kmv_overlap_matrix",
      ((s, d) => graft.ops.KmvSketch.pairwiseMatrix(
        events(s, d), "event_type", "user_id")): Q,
      Some(graft.ops.KmvSketch.pairwiseMatrixSql())),
    ("s11_recent_n", s11RecentN, Some(s11RecentNSql)),
    ("p6_isin", p6Isin, Some(p6IsinSql)),
    ("p10_encode", p10Encode, Some(p10EncodeSql)),
    ("p11_strings", p11Strings, Some(p11StringsSql)),
    ("p12_datetime", p12Datetime, Some(p12DatetimeSql)),
    ("p13_math", p13Math, Some(p13MathSql)),
    ("p14_buckets", p14Buckets, Some(p14BucketsSql)),
    ("j1_left_fill", j1LeftFill, Some(j1LeftFillSql)),
    ("j2_self_align", j2SelfAlign, Some(j2SelfAlignSql)),
    ("j4_dim_join", j4DimJoin, Some(j4DimJoinSql)),
    ("j_semi", jSemi, Some(jSemiSql)),
    ("j_anti", jAnti, Some(jAntiSql)),
    ("a1_multi_agg", a1MultiAgg, Some(a1MultiAggSql)),
    ("a2_year_stats", a2YearStats, Some(a2YearStatsSql)),
    ("a3_filtered_group", a3FilteredGroup, Some(a3FilteredGroupSql)),
    ("a4_distinct_card", a4DistinctCard, Some(a4DistinctCardSql)),
    ("a6_group_min", a6GroupMin, Some(a6GroupMinSql)),
    ("a7_rollup", a7Rollup, Some(a7RollupSql)),
    ("a8_global", a8Global, Some(a8GlobalSql)),
    ("a9_unique_sorted", a9Unique, Some(a9UniqueSql)),
    ("w1_ratio_min", w1RatioMin, Some(w1RatioMinSql)),
    ("w2_lag", w2Lag, Some(w2LagSql)),
    ("w3_running", w3Running, Some(w3RunningSql)),
    ("w4_argmin", w4Argmin, Some(w4ArgminSql)),
    ("w7_islands", w7Islands, Some(w7IslandsSql)),
    ("w8_pct_filter", w8PctFilter, Some(w8PctFilterSql)),
    ("o4_topk", o4TopK, Some(o4TopKSql)),
    ("o6_union", o6Union, Some(o6UnionSql)),
    ("o7_dedup", o7Dedup, Some(o7DedupSql)),
    ("set_intersect", setIntersect, Some(setIntersectSql)),
    ("set_except", setExcept, Some(setExceptSql)),
    ("a_moments", aMoments, Some(aMomentsSql)),
    ("w_range_frame", wRangeFrame, Some(wRangeFrameSql)),
    ("stream_dedup_exactly_once", streamDedup, Some(streamDedupSql)),
    ("stream_hopping_window", streamHopping, Some(streamHoppingSql)),
    ("stream_static_enrich", streamStaticEnrich, Some(streamStaticEnrichSql)),
    ("stream_latest_state", streamLatestState, Some(streamLatestStateSql)),
    ("stream_running_stats",
      ((s, d) => graft.streaming.TwsOps.runningStatsBatch(events(s, d))): Q,
      Some(graft.streaming.TwsOps.runningStatsBatchSql)),
    ("a_retention_cohorts", aRetentionCohorts, Some(aRetentionCohortsSql)),
    ("a_funnel_steps", aFunnelSteps, Some(aFunnelStepsSql)),
    ("a_funnel_steps4", aFunnelSteps4, Some(aFunnelSteps4Sql)),
    ("scd2_history", scd2History, Some(scd2HistorySql)),
    ("j_bloom_pruned", jBloomPruned, Some(jBloomPrunedSql)),
    ("j_null_safe", jNullSafe, Some(jNullSafeSql)),
    ("a_salted_agg", aSaltedAgg, Some(aSaltedAggSql)),
    ("a_sessionize", aSessionize, Some(aSessionizeSql)),
    ("w_session_features", wSessionFeatures, Some(wSessionFeaturesSql)),
    ("w_ewma", wEwma, Some(wEwmaSql)),
    ("p_feature_scale", pFeatureScale, Some(pFeatureScaleSql)),
    ("a_interval_union", aIntervalUnion, Some(aIntervalUnionSql)),
    ("a_mode", aMode, Some(aModeSql)),
    ("w_interpolate_gaps", wInterpolateGaps, Some(wInterpolateGapsSql)),
    ("p_winsorize", pWinsorize, Some(pWinsorizeSql)),
    ("p_quantile_bucket", pQuantileBucket, Some(pQuantileBucketSql)),
    ("a_group_ols", aGroupOls, Some(aGroupOlsSql)),
    ("a_markov_transitions", aMarkovTransitions, Some(aMarkovTransitionsSql)),
    ("a_time_weighted_avg", aTimeWeightedAvg, Some(aTimeWeightedAvgSql)),
    ("a_histogram", aHistogram, Some(aHistogramSql)),
    ("a_time_grid_ffill", aTimeGridFfill, Some(aTimeGridFfillSql)),
    ("pipeline_cdc_apply", pipelineCdcApply, Some(pipelineCdcApplySql)),
    ("pipeline_incremental_join", pipelineIncrementalJoin,
      Some(pipelineIncrementalJoinSql)),
    ("j_part_promo_share", jPartPromoShare, Some(jPartPromoShareSql)),
    ("j_scd2_pointintime", jScd2PointInTime, Some(jScd2PointInTimeSql)),
    ("stream_tumbling_hour", streamTumbling, Some(streamTumblingSql)),
    ("stream_session_window", streamSession, Some(streamSessionSql)),
    ("stream_interval_join", streamIntervalJoin, Some(streamIntervalJoinSql)),
    ("stream_interval_join_outer", streamIntervalJoinOuter,
      Some(streamIntervalJoinOuterSql)),
    ("a_percentiles", aPercentiles, Some(aPercentilesSql)),
    ("a_percentiles_approx", aPercentilesApprox, None),
    ("j_skew_salted", jSkewSalted, Some(jSkewSaltedSql)),
    ("w_resample_ohlc", wResampleOhlc, Some(wResampleOhlcSql)),
    ("j_full_coalesce", jFullCoalesce, Some(jFullCoalesceSql)),
    ("quality_key_skew", qualityKeySkew, Some(qualityKeySkewSql)),
    ("quality_ref_integrity", qualityRefIntegrity, Some(qualityRefIntegritySql)),
    ("quality_k_anonymity", qualityKAnonymity, Some(qualityKAnonymitySql)),
    ("s2_upsert_merge", s2UpsertMerge, Some(s2UpsertMergeSql)),
    ("o_global_rank", oGlobalRank, Some(oGlobalRankSql)),
    ("o_zorder_cluster", oZorderCluster, Some(oZorderClusterSql)),
    ("quality_join_cardinality", qualityJoinCardinality,
      Some(qualityJoinCardinalitySql)),
    ("a_attribution_linear", aAttributionLinear, Some(aAttributionLinearSql))
  )
}
