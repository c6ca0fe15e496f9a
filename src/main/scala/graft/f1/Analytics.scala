package graft.f1

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The analytics query library over the warehouse / training tables —
  * SURVEY §2's F1-facing compositions (E2 read path + E3 serving path),
  * each a lazy DataFrame transformation (Catalyst does
  * pushdown/pruning; partition pruning applies when the warehouse is
  * read from its year=/round= tree).
  */
object Analytics {

  /** A2 era report: per-year speed stats
    * (F1_Data_Interactive_Analysis.ipynb:30-38). */
  def eraReport(warehouse: DataFrame): DataFrame =
    warehouse.groupBy(col("Year"))
      .agg(avg(col("Speed")).as("Avg_Speed"),
        max(col("Speed")).as("Max_Speed"),
        count(lit(1)).as("Data_Points"))
      .orderBy(col("Year"))

  /** A3 tyre report: compound performance on racing laps (:48-59).
    * Default compound set matches the reference's dry-race report. */
  def tyreReport(warehouse: DataFrame,
      compounds: Seq[String] = Seq("SOFT", "MEDIUM", "HARD")): DataFrame =
    warehouse
      .filter(col("Compound").isin(compounds: _*) && col("Speed") > 100)
      .groupBy(col("Compound"))
      .agg(avg(col("Speed")).as("Avg_Speed"), avg(col("RPM")).as("Avg_RPM"))
      // O3 custom categorical order: SOFT < MEDIUM < HARD < INTER < WET
      // (pd.Categorical — F1_Data_Interactive_Analysis.ipynb:66-68)
      .orderBy(LapAggregate.encodeCompound(col("Compound")))

  /** A4+J1+A7 data-completeness audit (F1_Data_Test.ipynb:135-240):
    * planned races LEFT JOIN actual per-round driver/point counts,
    * zero-filled, flagged when missing or under-populated, plus a
    * season rollup. Returns (detail, seasonSummary). */
  def dataAudit(raceMeta: DataFrame, warehouse: DataFrame,
      minDrivers: Int = 15): (DataFrame, DataFrame) = {
    val actual = warehouse.groupBy(col("Year"), col("Round"))
      .agg(countDistinct(col("Driver")).as("Driver_Count"),
        count(lit(1)).as("Telemetry_Count"))
    val detail = broadcast(raceMeta
      .select(col("year").as("Year"), col("round").as("Round"),
        col("event_name"), col("circuit")))
      .join(actual, Seq("Year", "Round"), "left")
      .na.fill(0, Seq("Driver_Count", "Telemetry_Count"))
      .withColumn("status",
        when(col("Telemetry_Count") === 0, "MISSING")
          .when(col("Driver_Count") < minDrivers, "INCOMPLETE")
          .otherwise("OK"))
      .orderBy(col("Year"), col("Round"))
    val season = detail.groupBy(col("Year"))
      .agg(count(lit(1)).as("Event"),
        avg(col("Driver_Count")).as("Driver_Count_mean"),
        sum(col("Telemetry_Count")).as("Telemetry_Count_sum"))
      .orderBy(col("Year"))
    (detail, season)
  }

  /** A6 fastest lap per driver; W5 extremes → (teacher, student). */
  def fastestLapPerDriver(laps: DataFrame): DataFrame =
    laps.groupBy(col("Driver"))
      .agg(min(col("LapTime_Sec")).as("Best_LapTime"))
      .orderBy(col("Best_LapTime"))

  /** W5: the fastest ("teacher") and slowest ("student") drivers by
    * best lap (P3 ipynb:57-62). Single-row frame. Tie on Best_LapTime
    * resolves to the lowest/highest Driver id (struct ordering) so the
    * answer is deterministic across shuffles and engines. */
  def teacherStudent(laps: DataFrame): DataFrame =
    fastestLapPerDriver(laps).agg(
      min_by(col("Driver"), struct(col("Best_LapTime"), col("Driver"))).as("teacher"),
      max_by(col("Driver"), struct(col("Best_LapTime"), col("Driver"))).as("student"))

  /** W1+W2 pace features on the training table
    * (P1 ipynb:262-267, 447-460): session-fastest window min,
    * pace ratio, and per-driver lag features with first-lap drop. */
  def paceFeatures(training: DataFrame): DataFrame = {
    val wSession = Window.partitionBy(col("Year"), col("Round"))
    val wDriver = Window.partitionBy(col("Year"), col("Round"), col("Driver"))
      .orderBy(col("LapNumber"))
    training
      .withColumn("Session_Fastest", min(col("LapTime_Sec")).over(wSession))
      .withColumn("Pace_Ratio", col("LapTime_Sec") / col("Session_Fastest"))
      .withColumn("Prev_Pace_Ratio", lag(col("Pace_Ratio"), 1).over(wDriver))
      .withColumn("Prev_Speed_mean", lag(col("Speed_mean"), 1).over(wDriver))
      .na.drop(Seq("Prev_Pace_Ratio", "Prev_Speed_mean"))
  }

  /** J2+W3 race simulation pace gap (P1 ipynb:585-618): align two
    * drivers' laps, per-lap gap and cumulative gap of d2 vs d1. */
  def paceGap(laps: DataFrame, driver1: Long, driver2: Long): DataFrame = {
    val d1 = laps.filter(col("Driver") === driver1)
      .select(col("LapNumber"), col("LapTime_Sec").as("t1"))
    val d2 = laps.filter(col("Driver") === driver2)
      .select(col("LapNumber"), col("LapTime_Sec").as("t2"))
    // bounded-frame invariant: the input is ONE driver pair's aligned
    // laps (≤ ~80 rows — a race has that many laps), so a single
    // window partition is the semantics, not a scale hazard; the
    // constant partition key states that explicitly (and keeps the
    // "no partition defined" warning out of 100×-scale triage)
    val w = Window.partitionBy(lit(0)).orderBy(col("LapNumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d1.join(d2, Seq("LapNumber"))
      .withColumn("gap", col("t2") - col("t1"))
      .withColumn("cum_gap", sum(col("gap")).over(w))
      .orderBy(col("LapNumber"))
  }

  /** J3 distance-grid alignment of two laps — the equi-join the 10 m
    * resample makes possible (P3 ipynb:320-322): returns per-grid-point
    * speed delta (reference speed − student speed). */
  def alignLaps(warehouse: DataFrame,
      refDriver: Long, refLap: Long,
      cmpDriver: Long, cmpLap: Long): DataFrame = {
    val ref = warehouse
      .filter(col("Driver") === refDriver && col("LapNumber") === refLap)
      .select(col("Distance"), col("Speed").as("ref_speed"))
    val cmp = warehouse
      .filter(col("Driver") === cmpDriver && col("LapNumber") === cmpLap)
      .select(col("Distance"), col("Speed").as("cmp_speed"))
    ref.join(cmp, Seq("Distance"))
      .withColumn("delta", col("ref_speed") - col("cmp_speed"))
      .orderBy(col("Distance"))
  }

  /** W7 gaps-and-islands problem zones (P3 ipynb:146-169): contiguous
    * stretches where delta > K, minimum length, top-N by peak loss,
    * with P14 advice buckets. Input: alignLaps output. */
  def problemZones(aligned: DataFrame, k: Double = 15.0,
      minLength: Double = 50.0, topN: Int = 5): DataFrame = {
    // bounded-frame invariant: input is ONE aligned lap pair on the
    // 10 m grid (≤ ~700 rows for a ~7 km circuit) — single-partition
    // ordering IS the gaps-and-islands semantics for one lap; the
    // constant key documents it and silences the WindowExec warning
    val wo = Window.partitionBy(lit(0)).orderBy(col("Distance"))
    val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aligned
      .withColumn("flag", (col("delta") > k).cast("int"))
      .withColumn("edge",
        when(lag(col("flag"), 1, 0).over(wo) =!= col("flag"), 1).otherwise(0))
      .withColumn("island", sum(col("edge")).over(wf))
      .filter(col("flag") === 1)
      .groupBy(col("island"))
      .agg(min(col("Distance")).as("start_dist"),
        max(col("Distance")).as("end_dist"),
        max(col("delta")).as("max_loss"))
      .withColumn("length", col("end_dist") - col("start_dist"))
      .filter(col("length") >= minLength)
      .orderBy(desc("max_loss"))
      .limit(topN)
      .withColumn("advice",
        when(col("max_loss") > 30, "CRITICAL: full-commit braking zone")
          .when(col("max_loss") > 20, "WARN: carry more apex speed")
          .otherwise("INFO: minor line deviation"))
      .select(col("start_dist"), col("end_dist"), col("length"),
        col("max_loss"), col("advice"))
  }

  /** A8/A9 dashboard aggregates (F1_web_dashboard_app.py:225-252):
    * global stats + sorted driver list. */
  def dashboardStats(warehouse: DataFrame): DataFrame =
    warehouse.agg(
      max(col("Speed")).as("max_speed"),
      max(col("Distance")).as("track_length"),
      countDistinct(col("Driver")).as("n_drivers"),
      min(col("LapTime_Sec")).as("fastest_lap"))

  def driverList(warehouse: DataFrame): DataFrame =
    warehouse.select(col("Driver")).distinct().orderBy(col("Driver"))

  /** W4: per driver, the lap row with minimal LapTime (deterministic
    * min_by on the unique LapNumber tiebreak). */
  def bestLapPerDriver(laps: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("Driver"))
      .orderBy(col("LapTime_Sec"), col("LapNumber"))
    laps.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Reference-compat quirk layer (SURVEY §1.3): expose the dashboard's
    * expected column spellings over the engine's canonical schema, so a
    * reference user's queries run unchanged. Renames only when the
    * target name is not already taken — idempotent on any frame. */
  def compatView(df: DataFrame): DataFrame = {
    val renames = Seq("LapTime_Sec" -> "LapTimeSeconds", "nGear" -> "Gear")
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from) && !d.columns.contains(to))
        d.withColumnRenamed(from, to)
      else d
    }
  }

  /** The dashboard's guarded base-lap-time
    * (F1_web_dashboard_app.py:318-329): 90.0 fallback when the frame is
    * empty, the LapTimeSeconds column is missing entirely, or the
    * minimum is implausible (≤ 10 s) — the reference guards instead of
    * crashing on a partial warehouse, and so do we. */
  def baseLapTime(df: DataFrame, fallback: Double = 90.0): Double = {
    if (!df.columns.contains("LapTimeSeconds")) fallback
    else {
      val row = df.agg(min(col("LapTimeSeconds").cast("double"))).collect()(0)
      if (row.isNullAt(0)) fallback
      else {
        val m = row.getDouble(0)
        if (m > 10.0) m else fallback
      }
    }
  }

  /** P13 strategy simulator (F1_web_dashboard_app.py:339-389): pure
    * scalar lap-time curve BASE·(1 + 0.005·lap·compoundFactor) over a
    * generated lap sequence — no input table needed. */
  def strategyCurve(spark: SparkSession, baseTime: Double, laps: Int,
      compoundFactor: Double): DataFrame = {
    import spark.implicits._
    (1 to laps).toDF("lap")
      .withColumn("lap_time",
        lit(baseTime) * (lit(1.0) + lit(0.005) * col("lap") * lit(compoundFactor)))
      .withColumn("strict_estimate", col("lap_time") * 1.05)
  }
}
