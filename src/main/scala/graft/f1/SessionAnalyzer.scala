package graft.f1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ml.InferenceHook

/** The post-session analysis path (F1-25_analyze_my_session.py):
  * recent-N scan → pick the last completed lap → sliding-window model
  * comparison → delta trace → debrief buckets. Runs over the session
  * log recorded by [[graft.streaming.StreamOps.recordSession]].
  */
object SessionAnalyzer {

  /** S11: most recent n samples, returned in ascending time order
    * (find().sort(-1).limit(n) then reverse — :31-38). */
  def recentWindow(recorded: DataFrame, n: Int = 5000): DataFrame =
    recorded.orderBy(desc("Timestamp")).limit(n).orderBy(asc("Timestamp"))

  /** O5: the second-to-last lap by order of appearance — the last
    * COMPLETED lap (:44-50); the only lap if there is just one. */
  def pickTargetLap(session: DataFrame): Long = {
    val laps = session.groupBy(col("LapNumber"))
      .agg(max(col("Timestamp")).as("last_ts"))
      .orderBy(col("last_ts"))
      .collect().map(_.getAs[Int]("LapNumber").toLong)
    if (laps.length > 1) laps(laps.length - 2) else laps.head
  }

  /** The lap comparison: model prediction (strict ×1.05) vs actual
    * speed, positionally aligned past the warm-up window (:78-90).
    * Live columns use the game's names (Gear) — the P8 compat rename
    * happens here. Returns (Distance, actual_speed, ai_speed, delta). */
  def lapComparison(session: DataFrame, lap: Long, trackLen: Double,
      hook: InferenceHook, strict: Boolean = true): DataFrame = {
    val lapDf = session.filter(col("LapNumber") === lap)
      .withColumnRenamed("Gear", "nGear")
      .withColumn("Driver", col("Driver").cast("long"))
      .withColumn("LapNumber", col("LapNumber").cast("long"))
      .withColumn("Brake", col("Brake") / 100.0) // live 0–100 → model 0–1
    val scaled = SequenceWindows.scaled(lapDf, trackLen)
    val wins = SequenceWindows.windows(scaled, F1Constants.SeqLen, stride = 1)
    val preds = InferenceHook.withPredictions(wins, hook)
    val bias = if (strict) 1.05 else 1.0
    preds.select(
      col("Distance"),
      (col("target") * F1Constants.ScaleMax(0)).as("actual_speed"),
      (col("prediction") * F1Constants.ScaleMax(0) * bias).as("ai_speed"))
      .withColumn("delta", col("ai_speed") - col("actual_speed"))
      .orderBy(col("Distance"))
  }

  /** P14 debrief verdict over the mean delta (:139-146). */
  def debrief(comparison: DataFrame): DataFrame =
    comparison.agg(avg(col("delta")).as("avg_speed_diff"))
      .withColumn("verdict",
        when(col("avg_speed_diff") > 10, "pace low — attack harder")
          .when(col("avg_speed_diff") > 5, "good lap — mind corner exits")
          .otherwise("perfect — AI-beating pace"))
}
