package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** §2.9 model-inference integration point. The engine ships feature
  * assembly (graft.f1.SequenceWindows) and this hook; actual model
  * runtimes (XGBoost / TF in the reference — P1 ipynb:487, P2
  * ipynb:158, F1_web_dashboard_app.py:476-494) stay out of the engine,
  * exactly as the reference keeps them in separate artifacts (S13).
  *
  * Implementations run per-partition: load the model once per
  * partition (not per row), score a batch at a time — the Scala
  * equivalent of the reference's vectorized model.predict loops.
  */
trait InferenceHook extends Serializable {
  /** Score one batch of feature windows (batch × steps × features). */
  def predictBatch(windows: Array[Array[Array[Float]]]): Array[Float]
}

object InferenceHook {

  /** Deterministic stand-in model: predicts the mean of the window's
    * speed feature (index 1) — a real model plugs in by replacing the
    * hook, nothing else changes. */
  object MeanSpeedStub extends InferenceHook {
    def predictBatch(windows: Array[Array[Array[Float]]]): Array[Float] =
      windows.map { w =>
        var s = 0.0f
        w.foreach(step => s += step(1))
        s / w.length
      }
  }

  /** Attach predictions to SequenceWindows.windows output: batches per
    * partition, model invoked once per batch of `batchSize`. */
  def withPredictions(windows: DataFrame, hook: InferenceHook,
      batchSize: Int = 256): DataFrame = {
    val spark = windows.sparkSession
    import spark.implicits._
    val in = windows.select(col("Driver"), col("LapNumber"),
      col("Distance").cast("float").as("Distance"), col("window"), col("target"))
      .as[(Long, Long, Float, Array[Array[Float]], Float)]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val preds = hook.predictBatch(batch.map(_._4).toArray)
        batch.iterator.zipWithIndex.map { case ((d, l, dist, _, tgt), i) =>
          (d, l, dist, tgt, preds(i))
        }
      }
    }.toDF("Driver", "LapNumber", "Distance", "target", "prediction")
  }

  /** Live-path inference — the reference's dormant AI-coaching edge
    * (F1-25_Telemetry_DB_Record.py:194-195): score each merged live
    * sample ([[graft.streaming.LiveMerge.LiveSample]] shape) as a
    * 1-step feature window with the serving scale bounds
    * (F1_web_dashboard_app.py:451-453), batched per partition. The
    * transformation is stateless, so the SAME code runs on the
    * streaming form (inside the micro-batch) and the batch form —
    * UdpBridgeSpec drives it end-to-end over a real socket replay. */
  def withLivePredictions(merged: DataFrame, hook: InferenceHook,
      trackLength: Double, batchSize: Int = 256): DataFrame = {
    val spark = merged.sparkSession
    import spark.implicits._
    val sm = graft.f1.F1Constants.ScaleMax
    val in = merged.select(col("Timestamp"), col("Driver"), col("Speed"),
      col("Throttle"), col("Brake"), col("Gear"), col("Distance"),
      col("LapNumber"))
      .as[(Double, Long, Int, Double, Double, Int, Double, Int)]
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val windows = batch.map { case (_, _, speed, throttle, brake, gear, dist, _) =>
          Array(Array((dist / trackLength).toFloat, (speed / sm(0)).toFloat,
            (throttle / sm(1)).toFloat, (brake / sm(2)).toFloat,
            (gear / sm(3)).toFloat))
        }.toArray
        val preds = hook.predictBatch(windows)
        batch.iterator.zipWithIndex.map {
          case ((ts, d, sp, th, br, g, dist, lap), i) =>
            (ts, d, sp, th, br, g, dist, lap, preds(i))
        }
      }
    }.toDF("Timestamp", "Driver", "Speed", "Throttle", "Brake", "Gear",
      "Distance", "LapNumber", "prediction")
  }
}
