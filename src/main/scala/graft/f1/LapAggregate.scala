package graft.f1

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-2 gold build: warehouse telemetry → per-lap training table
  * (create_clean_dataset, F1_Data_PreProcessing.ipynb:264-351).
  *
  * A1 lap rollup + W8 107% outlier rule + P10 compound encode. The
  * reference's per-(Year,Round) Python loop for the 107% cutoff becomes
  * a window min — no driver-side iteration, fully distributed.
  *
  * Scale notes: one shuffle for the lap groupBy (partial aggregation
  * map-side), one for the (Year,Round) window — at 100 TB the window
  * partition count is seasons×rounds (small), but each partition is
  * only lap-level rows (thousands), not telemetry rows, because the
  * window runs AFTER the rollup. Compound is constant within a lap, so
  * pandas' order-dependent 'first' is reproduced with min_by over the
  * grid distance (deterministic, SURVEY §2.4 A1 caveat).
  */
object LapAggregate {
  import F1Constants._

  /** upper() + dictionary encode, unknown→0 (P10). */
  def encodeCompound(c: Column): Column =
    CompoundCode.foldLeft(when(lit(false), 0)) { case (acc, (k, v)) =>
      acc.when(upper(c) === k, v)
    }.otherwise(0).cast("long")

  /** A1: per-lap aggregate with the reference's output names. */
  def lapRollup(warehouse: DataFrame): DataFrame =
    warehouse
      .groupBy(col("Year"), col("Round"), col("Driver"), col("LapNumber"))
      .agg(
        avg(col("Speed")).cast("float").as("Speed_mean"),
        avg(col("Throttle")).cast("float").as("Throttle_mean"),
        avg(col("Brake")).as("Brake_mean"),
        max(col("TyreLife")).as("TyreLife_max"),
        min_by(col("Compound"), col("Distance")).as("Compound"),
        max(col("LapTime_Sec")).as("LapTime_Sec"))

  /** W8: keep laps with LapTime <= 1.07 × session-fastest and > 50 s. */
  def pct107Filter(laps: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("Year"), col("Round"))
    laps
      .withColumn("_fastest", min(col("LapTime_Sec")).over(w))
      .filter(col("LapTime_Sec") <= col("_fastest") * PctThreshold &&
        col("LapTime_Sec") > MinLapTime)
      .drop("_fastest")
  }

  /** Full gold build: rollup → 107% clean → encode → drop unknown. */
  def trainingTable(warehouse: DataFrame): DataFrame =
    pct107Filter(lapRollup(warehouse))
      .withColumn("Compound_Encoded", encodeCompound(col("Compound")))
      .filter(col("Compound_Encoded") =!= 0L)
}
