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
}
