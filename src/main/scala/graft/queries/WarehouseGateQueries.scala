package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.f1.{Analytics, SessionAnalyzer, TelemetryPoint, WarehouseBuild}
import QueryDsl._

/** CORRECTNESS gates for the warehouse file seam (S5 partitioned sink,
  * S6 full-tree scan, S7 partition-pruned scan, S3 delete-then-insert
  * rebuild) and the small preprocessing stragglers (P2 null-drop,
  * P3 null-fill + int cast, P8 rename-compat, O5 positional pick) —
  * the §2 rows that previously carried only ScalaTest evidence.
  *
  * Reference shapes: the year=/round= snappy warehouse write
  * (F1_Data_PreProcessing.ipynb:133-139), the path-constructed
  * readbacks (train_by_circuit.py:124-128), the per-round
  * delete-then-insert (F1_Data_Collect.ipynb:122), dropna/fillna+cast
  * (F1_Data_PreProcessing.ipynb:58-61), the dashboard rename quirks
  * (F1_web_dashboard_app.py:115-116), and the second-to-last-lap pick
  * (F1-25_analyze_my_session.py:47-50).
  *
  * Two oracle styles, deliberately:
  *  - '''Interop gates''' (s5, s7): the engine WRITES a hive-partitioned
  *    tree to a fixed path, reads it back, and the DuckDB oracle reads
  *    THE SAME FILES via `read_parquet(..., hive_partitioning=true)` —
  *    a hash match proves the on-disk layout is standard enough for a
  *    foreign engine, not just round-trippable by Spark. (Assumes the
  *    verifier checks an SF right after dumping it, which both the
  *    local checker and the driver do; the semantic gates below carry
  *    no such assumption.)
  *  - '''Semantic gates''' (s6, s3, p2p3, p8, o5): the oracle re-derives
  *    the expected answer from the `events` table in pure SQL, so a
  *    write/read bug (lost partition, mangled value, wrong overwrite
  *    scope) mismatches even though the engine is the only file reader.
  *
  * Oracle-exactness: every fixture value is integer arithmetic on the
  * group KEYS (not on raw event ids), so the fixture is identical at
  * any SF where the same key combinations occur, and every float/double
  * is an exactly-representable integer — immune to the Spark-truncates
  * vs DuckDB-rounds cast split and to summation order. */
object WarehouseGateQueries {

  /** Deterministic warehouse fixture: key combos from events (≤ 15
    * user-residues × 300 event-residues), features derived from the
    * keys via one integer seed `e`. Types match [[TelemetryPoint]]. */
  private def fixture(s: SparkSession, d: String): DataFrame = {
    val keys = events(s, d).select(
      (col("user_id") % 3 + 2020).as("Year"),
      (col("event_id") % 4 + 1).as("Round"),
      (col("user_id") % 5).as("Driver"),
      (col("event_id") % 3 + 1).as("LapNumber"),
      (col("event_id") % 100).as("di")).distinct()
    keys
      .withColumn("e",
        (col("Year") - 2019) * 7919 + col("Round") * 611 +
          col("Driver") * 101 + col("LapNumber") * 31 + col("di"))
      .select(
        (col("di") * 10).cast("float").as("Distance"),
        (col("e") % 300).cast("float").as("Speed"),
        (col("e") % 120 * 100).cast("float").as("RPM"),
        (col("e") % 101).cast("float").as("Throttle"),
        (col("e") % 2).cast("double").as("Brake"),
        (col("e") % 8 + 1).cast("double").as("nGear"),
        (lit(1) + (col("e") % 2) * 2).cast("double").as("DRS"),
        col("Year"), col("Round"), col("Driver"), col("LapNumber"),
        when(col("e") % 3 === 0, "SOFT").when(col("e") % 3 === 1, "MEDIUM")
          .otherwise("HARD").as("Compound"),
        (col("e") % 30).cast("double").as("TyreLife"),
        (col("e") % 90 + 60).cast("double").as("LapTime_Sec"))
  }

  /** The same fixture in DuckDB SQL, final columns lowercased. */
  private val fixtureSql =
    """WITH k AS (
      |  SELECT DISTINCT user_id % 3 + 2020 AS year, event_id % 4 + 1 AS round,
      |    user_id % 5 AS driver, event_id % 3 + 1 AS lapnumber,
      |    event_id % 100 AS di
      |  FROM events),
      |f AS (
      |  SELECT year, round, driver, lapnumber, di,
      |    (year - 2019) * 7919 + round * 611 + driver * 101 + lapnumber * 31 + di AS e
      |  FROM k)""".stripMargin

  private val fixtureColsSql =
    """year, round, driver, lapnumber,
      |  CAST(di * 10 AS FLOAT) AS distance,
      |  CAST(e % 300 AS FLOAT) AS speed,
      |  CAST(e % 120 * 100 AS FLOAT) AS rpm,
      |  CAST(e % 101 AS FLOAT) AS throttle,
      |  CAST(e % 2 AS DOUBLE) AS brake,
      |  CAST(e % 8 + 1 AS DOUBLE) AS ngear,
      |  CAST(1 + (e % 2) * 2 AS DOUBLE) AS drs,
      |  CASE e % 3 WHEN 0 THEN 'SOFT' WHEN 1 THEN 'MEDIUM' ELSE 'HARD' END AS compound,
      |  CAST(e % 30 AS DOUBLE) AS tyrelife,
      |  CAST(e % 90 + 60 AS DOUBLE) AS laptime_sec""".stripMargin

  /** Lowercase the canonical readback schema for the hash compare. */
  private def lowered(df: DataFrame): DataFrame = df.select(
    col("Year").as("year"), col("Round").as("round"),
    col("Driver").as("driver"), col("LapNumber").as("lapnumber"),
    col("Distance").as("distance"), col("Speed").as("speed"),
    col("RPM").as("rpm"), col("Throttle").as("throttle"),
    col("Brake").as("brake"), col("nGear").as("ngear"), col("DRS").as("drs"),
    col("Compound").as("compound"), col("TyreLife").as("tyrelife"),
    col("LapTime_Sec").as("laptime_sec"))

  private def writeAndRead(s: SparkSession, d: String, root: String): DataFrame = {
    import s.implicits._
    WarehouseBuild.writeWarehouse(fixture(s, d).as[TelemetryPoint], root)
    WarehouseBuild.readWarehouse(s, root)
  }

  private def interopSql(root: String, where: String = "") =
    s"""SELECT CAST(year AS BIGINT) AS year, CAST(round AS BIGINT) AS round,
       |  Driver AS driver, LapNumber AS lapnumber, Distance AS distance,
       |  Speed AS speed, RPM AS rpm, Throttle AS throttle, Brake AS brake,
       |  nGear AS ngear, DRS AS drs, Compound AS compound,
       |  TyreLife AS tyrelife, LapTime_Sec AS laptime_sec
       |FROM read_parquet('$root/year=*/round=*/*.parquet', hive_partitioning=true)
       |$where""".stripMargin

  // ---- S5: partitioned sink, foreign-engine readback of OUR files ----
  private val s5Root = "/tmp/graft_gate_wh_s5"
  private val s5Roundtrip: Q = (s, d) => lowered(writeAndRead(s, d, s5Root))

  // ---- S6: full-tree scan semantics (oracle re-derives, no file read) ----
  private val s6Root = "/tmp/graft_gate_wh_s6"
  private val s6Semantics: Q = (s, d) => lowered(writeAndRead(s, d, s6Root))
  private val s6SemanticsSql =
    s"$fixtureSql\nSELECT $fixtureColsSql\nFROM f"

  // ---- S7: partition-pruned scan of OUR files ----
  private val s7Root = "/tmp/graft_gate_wh_s7"
  private val s7Pruned: Q = (s, d) =>
    lowered(writeAndRead(s, d, s7Root)
      .filter(col("Year") === 2021 && col("Round") === 3))

  // ---- S5b: small-file compaction — content-identical bounded rewrite ----
  // The fragmented input (16-way pre-shuffle → ~16 files per partition)
  // is compacted to one sorted file per partition; the oracle reads the
  // COMPACTED files with DuckDB, so a hash match proves the rewrite is
  // lossless and the layout stays foreign-readable. File-count bounds
  // are asserted in CompactionSpec.
  private val s5cIn = "/tmp/graft_gate_wh_compact_in"
  private val s5cOut = "/tmp/graft_gate_wh_compact_out"
  private val s5Compaction: Q = (s, d) => {
    import s.implicits._
    WarehouseBuild.writeWarehouse(
      fixture(s, d).repartition(16).as[TelemetryPoint], s5cIn)
    graft.ops.Compaction.compact(s, s5cIn, s5cOut,
      partitionCols = Seq("year", "round"),
      sortCols = Seq("Driver", "LapNumber", "Distance"))
    lowered(WarehouseBuild.readWarehouse(s, s5cOut))
  }

  // ---- S3: per-round delete-then-insert as dynamic partition overwrite ----
  private val s3Root = "/tmp/graft_gate_wh_s3"
  private val s3Overwrite: Q = (s, d) => {
    import s.implicits._
    val fx = fixture(s, d)
    WarehouseBuild.writeWarehouse(fx.as[TelemetryPoint], s3Root)
    // rebuild ONE (year, round) with shifted speeds; the rest of the
    // warehouse must survive untouched
    val rebuilt = fx.filter(col("Year") === 2021 && col("Round") === 3)
      .withColumn("Speed", (col("Speed") + 1000.0f).cast("float"))
    WarehouseBuild.overwriteRounds(rebuilt.as[TelemetryPoint], s3Root)
    lowered(WarehouseBuild.readWarehouse(s, s3Root))
  }
  private val s3OverwriteSql =
    s"""$fixtureSql
       |SELECT year, round, driver, lapnumber,
       |  CAST(di * 10 AS FLOAT) AS distance,
       |  CAST(CASE WHEN year = 2021 AND round = 3 THEN e % 300 + 1000
       |            ELSE e % 300 END AS FLOAT) AS speed,
       |  CAST(e % 120 * 100 AS FLOAT) AS rpm,
       |  CAST(e % 101 AS FLOAT) AS throttle,
       |  CAST(e % 2 AS DOUBLE) AS brake,
       |  CAST(e % 8 + 1 AS DOUBLE) AS ngear,
       |  CAST(1 + (e % 2) * 2 AS DOUBLE) AS drs,
       |  CASE e % 3 WHEN 0 THEN 'SOFT' WHEN 1 THEN 'MEDIUM' ELSE 'HARD' END AS compound,
       |  CAST(e % 30 AS DOUBLE) AS tyrelife,
       |  CAST(e % 90 + 60 AS DOUBLE) AS laptime_sec
       |FROM f""".stripMargin

  // ---- P2/P3: null-drop on keys, null-fill + int cast (clean()) ----
  // Raw-shaped frame with deterministically injected nulls; the gate
  // runs the REAL operator and aggregates with exact integer sums
  // (every sum < 2^53, so double accumulation is order-immune).
  private val p2p3Clean: Q = (s, d) => {
    val ev = events(s, d)
    val raw = ev.select(
      lit(2024L).as("Year"),
      (col("event_id") % 4 + 1).as("Round"),
      (col("user_id") % 5).as("Driver"),
      when(col("event_id") % 11 =!= 0, col("event_id") % 3 + 1).as("LapNumber"),
      when(col("event_id") % 13 =!= 0,
        (col("event_id") % 1000).cast("double") / 10.0).as("Time"),
      when(col("event_id") % 7 =!= 0,
        (col("event_id") % 300).cast("double")).as("Speed"),
      when(col("event_id") % 5 =!= 0,
        (col("event_id") % 120 * 100).cast("double")).as("RPM"),
      when(col("event_id") % 6 =!= 0,
        (col("event_id") % 8 + 1).cast("double")).as("nGear"),
      (col("event_id") % 101).cast("double").as("Throttle"),
      (col("event_id") % 2).cast("double").as("Brake"),
      when(col("event_id") % 9 =!= 0,
        (lit(1) + (col("event_id") % 2) * 2).cast("double")).as("DRS"),
      when(col("event_id") % 17 =!= 0,
        (col("event_id") % 5000).cast("double")).as("Distance"),
      when(col("event_id") % 8 =!= 0,
        when(col("event_id") % 3 === 0, "SOFT")
          .when(col("event_id") % 3 === 1, "MEDIUM").otherwise("HARD"))
        .as("Compound"),
      when(col("event_id") % 10 =!= 0,
        (col("event_id") % 30).cast("double")).as("TyreLife"))
    WarehouseBuild.clean(raw)
      .groupBy(col("Round").as("round"), col("Driver").as("driver"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("Speed")).as("sum_speed"),
        sum(col("RPM")).as("sum_rpm"),
        sum(col("nGear")).as("sum_ngear"),
        sum(col("DRS")).as("sum_drs"),
        sum(col("TyreLife")).as("sum_tyrelife"),
        count(when(col("Compound") === "UNKNOWN", 1)).as("n_unknown"),
        min(col("Time")).as("min_time"),
        max(col("Time")).as("max_time"))
  }
  private val p2p3CleanSql =
    """WITH raw AS (
      |  SELECT event_id % 4 + 1 AS round, user_id % 5 AS driver,
      |    CASE WHEN event_id % 11 <> 0 THEN event_id % 3 + 1 END AS lapnumber,
      |    CASE WHEN event_id % 13 <> 0
      |         THEN CAST(event_id % 1000 AS DOUBLE) / 10.0 END AS time,
      |    CASE WHEN event_id % 7 <> 0
      |         THEN CAST(event_id % 300 AS DOUBLE) END AS speed,
      |    CASE WHEN event_id % 5 <> 0
      |         THEN CAST(event_id % 120 * 100 AS DOUBLE) END AS rpm,
      |    CASE WHEN event_id % 6 <> 0
      |         THEN CAST(event_id % 8 + 1 AS DOUBLE) END AS ngear,
      |    CAST(event_id % 101 AS DOUBLE) AS throttle,
      |    CAST(event_id % 2 AS DOUBLE) AS brake,
      |    CASE WHEN event_id % 9 <> 0
      |         THEN CAST(1 + (event_id % 2) * 2 AS DOUBLE) END AS drs,
      |    CASE WHEN event_id % 17 <> 0
      |         THEN CAST(event_id % 5000 AS DOUBLE) END AS distance,
      |    CASE WHEN event_id % 8 <> 0 THEN
      |      CASE event_id % 3 WHEN 0 THEN 'SOFT' WHEN 1 THEN 'MEDIUM'
      |           ELSE 'HARD' END END AS compound,
      |    CASE WHEN event_id % 10 <> 0
      |         THEN CAST(event_id % 30 AS DOUBLE) END AS tyrelife
      |  FROM events),
      |cleaned AS (
      |  SELECT round, driver, lapnumber, time, speed,
      |    COALESCE(rpm, 0.0) AS rpm,
      |    CAST(CAST(COALESCE(ngear, 0.0) AS INT) AS DOUBLE) AS ngear,
      |    CAST(CAST(COALESCE(drs, 0.0) AS INT) AS DOUBLE) AS drs,
      |    COALESCE(compound, 'UNKNOWN') AS compound,
      |    COALESCE(tyrelife, 0.0) AS tyrelife
      |  FROM raw
      |  WHERE speed IS NOT NULL AND distance IS NOT NULL
      |    AND lapnumber IS NOT NULL AND time IS NOT NULL)
      |SELECT round, driver, COUNT(*) AS n,
      |  SUM(speed) AS sum_speed, SUM(rpm) AS sum_rpm,
      |  SUM(ngear) AS sum_ngear, SUM(drs) AS sum_drs,
      |  SUM(tyrelife) AS sum_tyrelife,
      |  CAST(COUNT(CASE WHEN compound = 'UNKNOWN' THEN 1 END) AS BIGINT) AS n_unknown,
      |  MIN(time) AS min_time, MAX(time) AS max_time
      |FROM cleaned GROUP BY 1, 2""".stripMargin

  // ---- P8: reference-compat renames over the canonical schema ----
  private val p8Compat: Q = (s, d) =>
    Analytics.compatView(fixture(s, d)).select(
      col("Year").as("year"), col("Round").as("round"),
      col("Driver").as("driver"), col("LapNumber").as("lapnumber"),
      col("Distance").as("distance"), col("Gear").as("gear"),
      col("LapTimeSeconds").as("laptimeseconds"))
  private val p8CompatSql =
    s"""$fixtureSql
       |SELECT year, round, driver, lapnumber,
       |  CAST(di * 10 AS FLOAT) AS distance,
       |  CAST(e % 8 + 1 AS DOUBLE) AS gear,
       |  CAST(e % 90 + 60 AS DOUBLE) AS laptimeseconds
       |FROM f""".stripMargin

  // ---- O5: positional pick — the second-to-last lap by last-seen order ----
  private val o5Pick: Q = (s, d) => {
    import s.implicits._
    val session = events(s, d).select(
      (col("event_id") % 5 + 1).cast("int").as("LapNumber"),
      col("event_id").as("Timestamp"))
    Seq(SessionAnalyzer.pickTargetLap(session)).toDF("target_lap")
  }
  private val o5PickSql =
    """WITH m AS (
      |  SELECT event_id % 5 + 1 AS lap, MAX(event_id) AS last_ts
      |  FROM events GROUP BY 1)
      |SELECT CAST(lap AS BIGINT) AS target_lap
      |FROM m ORDER BY last_ts DESC LIMIT 1 OFFSET 1""".stripMargin

  // ---- Schema evolution: v1 files lack a column v2 files carry ----
  // (the reference's bronze docs gain Compound/TyreLife over time —
  // SURVEY §1.1); engine writes both generations, reads them conformed
  // to the contract; oracle re-derives the null-filled union from
  // events directly.
  private val sSchemaEvolution: Q = (s, d) => {
    val root = "/tmp/graft_gate_schema_evo"
    val ev = events(s, d)
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"))
      .write.mode("overwrite").parquet(s"$root/v1")
    ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("user_id"), col("value"))
      .write.mode("overwrite").parquet(s"$root/v2")
    graft.sources.SchemaEvolution.readConformed(s,
      org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, value DOUBLE"),
      s"$root/v1", s"$root/v2")
  }
  private val sSchemaEvolutionSql =
    """SELECT event_id, user_id,
      |  CASE WHEN event_id % 2 = 1 THEN value END AS value
      |FROM events""".stripMargin

  // ---- E3: the full serving lifecycle as ONE composed plan ----
  // (F1_web_dashboard_app.py:104-591): partition-pruned warehouse read
  // → driver slice → min-max scale (:451-453) → 20-step stride-5
  // sequence windows (:455-460) → inference hook (:476-494, stub) →
  // inverse scale → human/AI union for the comparison chart (:543-580).
  // Every piece is individually gated (s7, w6, p13, o6); this row is
  // the single-plan witness that they COMPOSE — one lazy DataFrame from
  // pruned scan to union, no intermediate materialization
  // (ServingE2ESpec asserts partition pruning survives the whole plan).
  //
  // Oracle-exactness through the float path: the stub's prediction is a
  // LEFT-FOLD float32 sum of the window's f_speed features divided by
  // 20f; the mirror reproduces the same IEEE-754 single-precision chain
  // with nested CAST(... AS FLOAT) additions over lag() — verified
  // bit-identical cross-engine — then one double multiply (×360)
  // for the inverse scale, exactly like inverseScaleSpeed.
  private val e3Root = "/tmp/graft_gate_wh_e3"
  private val f1E2eServing: Q = (s, d) => {
    import graft.f1.{F1Constants, SequenceWindows}
    val slice = writeAndRead(s, d, e3Root)
      .filter(col("Year") === 2021 && col("Round") === 3) // partition prune
      .filter(col("Driver") === 1)                        // dashboard slice
    val scaled = SequenceWindows.scaled(slice, trackLength = 1000.0)
    val wins = SequenceWindows.windows(scaled,
      seqLen = F1Constants.SeqLen, stride = 5)
    val preds = graft.ml.InferenceHook.withPredictions(
      wins, graft.ml.InferenceHook.MeanSpeedStub)
    val ai = SequenceWindows.inverseScaleSpeed(preds, "prediction")
      .select(lit("ai").as("source"), col("Driver").as("driver"),
        col("LapNumber").as("lapnumber"),
        col("Distance").cast("double").as("distance"),
        col("pred_speed").as("speed"))
    val human = slice.select(lit("human").as("source"),
      col("Driver").as("driver"), col("LapNumber").as("lapnumber"),
      col("Distance").cast("double").as("distance"),
      col("Speed").cast("double").as("speed"))
    human.unionByName(ai)
  }

  /** The stub's sequential float32 accumulation, oldest step first —
    * fl32(...fl32(fl32(0 + f₋₁₉) + f₋₁₈)... + f₀). */
  private val f32Fold = (19 to 0 by -1)
    .foldLeft("CAST(0.0 AS FLOAT)") { (acc, k) =>
      s"CAST(($acc + lag(fs, $k) OVER w) AS FLOAT)"
    }

  private val f1E2eServingSql =
    s"""$fixtureSql,
       |sl AS (
       |  SELECT driver, lapnumber,
       |    CAST(di * 10 AS FLOAT) AS distf,
       |    CAST(e % 300 AS FLOAT) AS speedf
       |  FROM f
       |  WHERE year = 2021 AND round = 3 AND driver = 1),
       |o AS (
       |  SELECT driver, lapnumber, distf, speedf,
       |    row_number() OVER (PARTITION BY driver, lapnumber
       |                       ORDER BY distf) AS rn,
       |    CAST(CAST(speedf AS DOUBLE) / 360.0 AS FLOAT) AS fs
       |  FROM sl),
       |acc AS (
       |  SELECT driver, lapnumber, distf, rn, $f32Fold AS sfold
       |  FROM o
       |  WINDOW w AS (PARTITION BY driver, lapnumber ORDER BY rn)),
       |ai AS (
       |  SELECT 'ai' AS source, driver, lapnumber,
       |    CAST(distf AS DOUBLE) AS distance,
       |    CAST(CAST(sfold / CAST(20 AS FLOAT) AS FLOAT) AS DOUBLE) * 360.0
       |      AS speed
       |  FROM acc WHERE rn >= 20 AND rn % 5 = 0),
       |hu AS (
       |  SELECT 'human' AS source, driver, lapnumber,
       |    CAST(distf AS DOUBLE) AS distance, CAST(speedf AS DOUBLE) AS speed
       |  FROM sl)
       |SELECT * FROM hu UNION ALL SELECT * FROM ai""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("f1_e2e_serving", f1E2eServing, Some(f1E2eServingSql)),
    ("s_schema_evolution", sSchemaEvolution, Some(sSchemaEvolutionSql)),
    ("s5_partitioned_roundtrip", s5Roundtrip, Some(interopSql(s5Root))),
    ("s5_compaction", s5Compaction, Some(interopSql(s5cOut))),
    ("s6_roundtrip_semantics", s6Semantics, Some(s6SemanticsSql)),
    ("s7_pruned_scan", s7Pruned,
      Some(interopSql(s7Root, "WHERE year = 2021 AND round = 3"))),
    ("s3_overwrite_round", s3Overwrite, Some(s3OverwriteSql)),
    ("p2p3_clean", p2p3Clean, Some(p2p3CleanSql)),
    ("p8_compat_rename", p8Compat, Some(p8CompatSql)),
    ("o5_positional_pick", o5Pick, Some(o5PickSql)))
}
