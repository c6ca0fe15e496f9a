package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.f1.{Analytics, SequenceWindows}
import QueryDsl._

/** CORRECTNESS gates for the F1 serving-path trio J3/W5/W6 — the three
  * §2 compute operators that previously carried only ScalaTest coverage.
  * Each gate calls the REAL operator (Analytics.alignLaps,
  * Analytics.teacherStudent, SequenceWindows.windows) over a
  * warehouse-shaped frame derived deterministically from the synthetic
  * tables, with a DuckDB oracle mirroring the same derivation.
  *
  * Reference shapes: alignLaps = P3-F1_AI_Coaching_Report.ipynb:320-322,
  * teacherStudent = P3 ipynb:57-62, sequence windows =
  * P2-F1_AI_Ghost_Car_Model.ipynb:126-131 / F1_web_dashboard_app.py:467-477.
  *
  * Oracle-exactness notes:
  *  - j3: join keys + deltas are exact (integer-derived doubles, MIN agg).
  *  - w5: argmin/argmax tie-broken on Driver (struct ordering ≡ the
  *    oracle's ORDER BY metric, driver LIMIT 1).
  *  - w6: float32 features are IEEE-deterministic (double div → float32
  *    round-to-nearest is bit-identical in Spark and DuckDB); the window
  *    array is serialized as floor(x·2^20) integers (exact exponent
  *    shift, floor on both sides) joined into one string, so the
  *    nested-array hash problem disappears.
  */
object F1GateQueries {

  /** Warehouse-shaped distance-grid frame derived from events: 5 drivers
    * × 3 laps on a 10 m grid of 100 points; Speed = MIN(value) per grid
    * point (exact, order-independent). */
  private def gridWarehouse(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        (col("user_id") % 5).as("Driver"),
        (col("event_id") % 3).as("LapNumber"),
        ((col("event_id") % 100) * lit(10)).cast("double").as("Distance"),
        col("value").as("Speed"))
      .groupBy(col("Driver"), col("LapNumber"), col("Distance"))
      .agg(min(col("Speed")).as("Speed"))

  /** J3 — distance-grid lap alignment (the equi-join the 10 m resample
    * makes possible): driver 0 lap 1 vs driver 1 lap 1. */
  private val j3AlignLaps: Q = (s, d) =>
    Analytics.alignLaps(gridWarehouse(s, d), 0L, 1L, 1L, 1L)
      .select(col("Distance").as("distance"), col("ref_speed"),
        col("cmp_speed"), col("delta"))

  private val j3AlignLapsSql =
    """WITH wh AS (
      |  SELECT user_id % 5 AS driver, event_id % 3 AS lap,
      |    CAST((event_id % 100) * 10 AS DOUBLE) AS distance,
      |    MIN(value) AS speed
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT r.distance AS distance, r.speed AS ref_speed, c.speed AS cmp_speed,
      |  r.speed - c.speed AS delta
      |FROM (SELECT distance, speed FROM wh WHERE driver = 0 AND lap = 1) r
      |JOIN (SELECT distance, speed FROM wh WHERE driver = 1 AND lap = 1) c
      |  ON r.distance = c.distance""".stripMargin

  /** W5 — teacher/student extremes of the per-driver best "lap time"
    * (orders: Driver = o_custkey, LapTime_Sec = o_totalprice). */
  private val w5TeacherStudent: Q = (s, d) =>
    Analytics.teacherStudent(
      table(s, d, "orders").select(
        col("o_custkey").as("Driver"),
        col("o_totalprice").as("LapTime_Sec")))

  private val w5TeacherStudentSql =
    """WITH best AS (
      |  SELECT o_custkey AS driver, MIN(o_totalprice) AS best
      |  FROM orders GROUP BY 1)
      |SELECT
      |  (SELECT driver FROM best ORDER BY best ASC, driver ASC LIMIT 1) AS teacher,
      |  (SELECT driver FROM best ORDER BY best DESC, driver DESC LIMIT 1) AS student""".stripMargin

  /** W6 — LSTM sliding sequence windows (seqLen 20, serving stride 5)
    * over an events-derived telemetry frame; the packed float window is
    * emitted as a deterministic integer signature string. trackLength
    * 2^20 keeps f_dist an exact dyadic rational. */
  private val w6SequenceWindows: Q = (s, d) => {
    val wh = events(s, d).select(
      (col("user_id") % 5).as("Driver"),
      (col("event_id") % 3).as("LapNumber"),
      col("event_id").cast("double").as("Distance"),
      col("value").as("Speed"),
      (col("user_id") % 101).cast("double").as("Throttle"),
      (col("event_id") % 2).cast("double").as("Brake"),
      ((col("event_id") % 8) + 1).cast("double").as("nGear"))
    val scaled = SequenceWindows.scaled(wh, trackLength = 1048576.0)
    SequenceWindows.windows(scaled, seqLen = 20, stride = 5)
      .select(
        col("Driver").as("driver"), col("LapNumber").as("lap"),
        col("Distance").as("distance"),
        expr("""array_join(
          transform(
            flatten(transform(window,
              a -> transform(a, x -> cast(floor(cast(x as double) * 1048576.0d) as bigint)))),
            v -> cast(v as string)), ',')""").as("win_sig"),
        expr("cast(floor(cast(target as double) * 1048576.0d) as bigint)").as("target_sig"))
  }

  private val w6SequenceWindowsSql =
    """WITH wh AS (
      |  SELECT user_id % 5 AS driver, event_id % 3 AS lap,
      |    CAST(event_id AS DOUBLE) AS distance, value AS speed,
      |    CAST(user_id % 101 AS DOUBLE) AS throttle,
      |    CAST(event_id % 2 AS DOUBLE) AS brake,
      |    CAST(event_id % 8 + 1 AS DOUBLE) AS ngear
      |  FROM events),
      |f AS (
      |  SELECT driver, lap, distance,
      |    CAST(FLOOR(CAST(CAST(distance / 1048576.0 AS REAL) AS DOUBLE) * 1048576.0) AS BIGINT) AS i_dist,
      |    CAST(FLOOR(CAST(CAST(speed / 360.0 AS REAL) AS DOUBLE) * 1048576.0) AS BIGINT) AS i_speed,
      |    CAST(FLOOR(CAST(CAST(throttle / 100.0 AS REAL) AS DOUBLE) * 1048576.0) AS BIGINT) AS i_throttle,
      |    CAST(FLOOR(CAST(CAST(brake / 1.0 AS REAL) AS DOUBLE) * 1048576.0) AS BIGINT) AS i_brake,
      |    CAST(FLOOR(CAST(CAST(ngear / 8.0 AS REAL) AS DOUBLE) * 1048576.0) AS BIGINT) AS i_gear
      |  FROM wh),
      |st AS (
      |  SELECT driver, lap, distance, i_speed AS target_sig,
      |    CAST(i_dist AS VARCHAR) || ',' || CAST(i_speed AS VARCHAR) || ',' ||
      |    CAST(i_throttle AS VARCHAR) || ',' || CAST(i_brake AS VARCHAR) || ',' ||
      |    CAST(i_gear AS VARCHAR) AS step_sig
      |  FROM f),
      |w AS (
      |  SELECT driver, lap, distance, target_sig,
      |    array_to_string(list(step_sig) OVER
      |      (PARTITION BY driver, lap ORDER BY distance
      |       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), ',') AS win_sig,
      |    row_number() OVER (PARTITION BY driver, lap ORDER BY distance) AS rn
      |  FROM st)
      |SELECT driver, lap, distance, win_sig, target_sig
      |FROM w WHERE rn >= 20 AND rn % 5 = 0""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("j3_align_laps", j3AlignLaps, Some(j3AlignLapsSql)),
    ("w5_teacher_student", w5TeacherStudent, Some(w5TeacherStudentSql)),
    ("w6_sequence_windows", w6SequenceWindows, Some(w6SequenceWindowsSql))
  )
}
