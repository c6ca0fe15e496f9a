package graft.f1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** W6 sliding sequence windows — the LSTM feature builder
  * (P2 ipynb:126-131, train_by_circuit.py:164-168): 20-step lookback
  * windows of scaled features over the distance grid, stride 1 (train)
  * or 5 (serving), target = the current step's speed.
  *
  * Spark-first shape: collect_list over a ROWS window per (Driver,
  * LapNumber) — no per-group Python loop, no driver-side materialize;
  * the output is ArrayType(ArrayType(Float)) ready for an inference
  * UDF. Stride is a row_number filter. Scale: windows never cross lap
  * boundaries, so partitions stay lap-sized.
  */
object SequenceWindows {
  import F1Constants._

  /** Min-max scale the model features with the fixed serving bounds
    * [0,0,0,0]..[trackLen,360,100,1,8] (F1_web_dashboard_app.py:451-453). */
  def scaled(warehouse: DataFrame, trackLength: Double): DataFrame =
    warehouse.select(
      col("Driver"), col("LapNumber"), col("Distance"),
      (col("Distance") / trackLength).as("f_dist"),
      (col("Speed") / ScaleMax(0)).as("f_speed"),
      (col("Throttle") / ScaleMax(1)).as("f_throttle"),
      (col("Brake") / ScaleMax(2)).as("f_brake"),
      (col("nGear") / ScaleMax(3)).as("f_gear"))

  /** Sliding windows of length seqLen with the given stride; emits
    * (keys, window: array<array<float>>, target = current f_speed). */
  def windows(scaledDf: DataFrame, seqLen: Int = SeqLen,
      stride: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("Driver"), col("LapNumber"))
      .orderBy(col("Distance"))
    val frame = w.rowsBetween(-(seqLen - 1), Window.currentRow)
    val features = array(col("f_dist").cast("float"),
      col("f_speed").cast("float"), col("f_throttle").cast("float"),
      col("f_brake").cast("float"), col("f_gear").cast("float"))
    scaledDf
      .withColumn("window", collect_list(features).over(frame))
      .withColumn("rn", row_number().over(w))
      .filter(size(col("window")) === seqLen)
      .filter((col("rn") % stride) === 0)
      .select(col("Driver"), col("LapNumber"), col("Distance"),
        col("window"), col("f_speed").cast("float").as("target"))
  }

  /** Inverse of the serving scale for model outputs, with the ×1.05
    * strict-mode bias (F1_web_dashboard_app.py:485, P3 ipynb:316). */
  def inverseScaleSpeed(pred: DataFrame, predCol: String,
      strict: Boolean = false): DataFrame = {
    val unscaled = col(predCol) * ScaleMax(0)
    pred.withColumn("pred_speed",
      if (strict) unscaled * 1.05 else unscaled)
  }
}
