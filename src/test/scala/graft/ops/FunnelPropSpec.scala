package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity: the sorted-stream cascade must equal the
  * definitional min-scan semantics (earliest stage-1, then earliest
  * stage-2 strictly after it, ...) on adversarial small streams —
  * dense timestamp ties, repeated stages, missing stages, users with
  * zero qualifying events. This is the regression net for the round-5
  * skew-safe rewrite. */
class FunnelPropSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Definitional reference: repeated full min-scans per stage. */
  private def brute(evs: Seq[(Long, String, Long)],
      types: Seq[String]): Map[Long, Seq[Long]] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val t = Array.fill(types.size)(-1L)
      for (i <- types.indices) {
        if (i == 0 || t(i - 1) >= 0) {
          val after = if (i == 0) Long.MinValue else t(i - 1)
          val cands = es.collect {
            case (_, tp, us) if tp == types(i) && us > after => us
          }
          if (cands.nonEmpty) t(i) = cands.min
        }
      }
      if (t(0) >= 0) Some(u -> t.toSeq) else None
    }

  test("cascade equals the definitional min-scan on random tie-dense streams") {
    import spark.implicits._
    val types = Seq("a", "b", "c")
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val evs = for {
        u <- 1L to 50L
        _ <- 0 until rnd.nextInt(30)
      } yield (u, Seq("a", "b", "c", "x")(rnd.nextInt(4)), rnd.nextInt(40).toLong)
      val got = Funnel.stages(evs.toDF("user_id", "event_type", "ev_us"), types)
        .collect()
        .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === brute(evs, types), s"trial $trial")
    }
  }
}
