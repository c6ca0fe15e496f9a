package graft.f1

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.InferenceHook

class SessionAnalyzerSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Synthetic recorded session: laps 3, 4, 5 in time order; lap 5 is
    * in progress (few samples). Mirrors the live_race_data shape. */
  private def session = {
    import spark.implicits._
    def lap(lapNo: Int, t0: Double, n: Int) = (0 until n).map { i =>
      (t0 + i * 0.1, 1L, 200 + (i % 30), 80.0, 10.0, 6, 10500,
        i * 40.0, lapNo)
    }
    (lap(3, 100, 60) ++ lap(4, 200, 60) ++ lap(5, 300, 8))
      .toDF("Timestamp", "Driver", "Speed", "Throttle", "Brake", "Gear",
        "RPM", "Distance", "LapNumber")
  }

  test("recent window: newest N in ascending order") {
    val win = SessionAnalyzer.recentWindow(session, 100).collect()
    assert(win.length === 100)
    val ts = win.map(_.getAs[Double]("Timestamp"))
    assert(ts.toSeq === ts.sorted.toSeq)
    assert(ts.head > 100.0) // oldest rows of lap 3 fell out of the window
  }

  test("target lap is the last completed one") {
    assert(SessionAnalyzer.pickTargetLap(session) === 4L)
    val oneLap = session.filter(col("LapNumber") === 3)
    assert(SessionAnalyzer.pickTargetLap(oneLap) === 3L)
  }

  test("lap comparison + debrief verdict") {
    val cmp = SessionAnalyzer.lapComparison(session, 4L, trackLen = 2400.0,
      hook = InferenceHook.MeanSpeedStub).cache()
    val rows = cmp.collect()
    // 60 samples − 19 warm-up = 41 aligned points
    assert(rows.length === 60 - (F1Constants.SeqLen - 1))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("delta") -
        (r.getAs[Double]("ai_speed") - r.getAs[Double]("actual_speed"))) < 1e-9)
      assert(r.getAs[Double]("actual_speed") >= 200.0)
    }
    val d = SessionAnalyzer.debrief(cmp).head
    assert(Seq("pace low — attack harder", "good lap — mind corner exits",
      "perfect — AI-beating pace").contains(d.getAs[String]("verdict")))
  }
}
