package graft.f1

/** Canonical typed schemas for the F1 telemetry engine (SURVEY §1.2,
  * measured from the reference's shipped parquet).
  */

/** One cleaned pre-resample telemetry sample (bronze; FIXTURES.md §1
  * after the P2/P3 cleanup: nulls dropped/filled, Brake as int 0/1). */
case class CleanSample(
    Year: Long,
    Round: Long,
    Driver: Long,
    LapNumber: Long,
    Time: Double,
    Speed: Double,
    RPM: Double,
    nGear: Double,
    Throttle: Double,
    Brake: Double,
    DRS: Double,
    Distance: Double,
    Compound: String,
    TyreLife: Double)

/** One warehouse row: a point on the uniform 10 m distance grid.
  * Field types mirror the measured parquet schema exactly
  * (float32 Distance/Speed/RPM/Throttle, float64 Brake/nGear/DRS,
  * int64 keys — F1_Data_PreProcessing.ipynb:128-131). */
case class TelemetryPoint(
    Distance: Float,
    Speed: Float,
    RPM: Float,
    Throttle: Float,
    Brake: Double,
    nGear: Double,
    DRS: Double,
    Year: Long,
    Round: Long,
    Driver: Long,
    LapNumber: Long,
    Compound: String,
    TyreLife: Double,
    LapTime_Sec: Double)

/** One training-table row: per-lap aggregate (FIXTURES.md §3, measured
  * from f1_training_dataset_v2.parquet). */
case class LapFeature(
    Year: Long,
    Round: Long,
    Driver: Long,
    LapNumber: Long,
    Speed_mean: Float,
    Throttle_mean: Float,
    Brake_mean: Double,
    TyreLife_max: Double,
    Compound: String,
    LapTime_Sec: Double,
    Compound_Encoded: Long)

/** Race metadata dimension (F1_Data_Collect.ipynb:108-112). */
case class RaceMeta(
    year: Long,
    round: Long,
    event_name: String,
    circuit: String,
    date: String)

object F1Constants {
  /** Grid step for the distance resample (meters). */
  val GridStep = 10.0
  /** Lap validity gates (F1_Data_PreProcessing.ipynb:71). */
  val MinSamples = 10
  val MinLapDistance = 2000.0
  /** 107% rule + absolute lap-time floor (:320-326). */
  val PctThreshold = 1.07
  val MinLapTime = 50.0
  /** Compound dictionary (:336-342). */
  val CompoundCode: Map[String, Int] = Map(
    "SOFT" -> 1, "MEDIUM" -> 2, "HARD" -> 3,
    "INTERMEDIATE" -> 4, "WET" -> 5, "UNKNOWN" -> 0)
  /** LSTM sequence-window parameters (P2 ipynb:126-131). */
  val SeqLen = 20
  /** Min-max scaler bounds [0,..]..[trackLen,360,100,1,8]
    * (F1_web_dashboard_app.py:453). */
  val ScaleMax = Array(360.0, 100.0, 1.0, 8.0) // Speed, Throttle, Brake, nGear
}
