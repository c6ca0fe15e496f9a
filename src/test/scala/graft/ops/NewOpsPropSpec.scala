package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity for the late-round-5 operators: each Spark
  * implementation must equal a definitional in-memory reference on
  * adversarial small inputs (timestamp ties, singleton users, spans
  * without grid points, equal-gap boundaries). Seeded — failures
  * reproduce. */
class NewOpsPropSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("sessionize equals the definitional linear scan on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 3) {
      val evs = for {
        u <- 1L to 30L
        i <- 0 until rnd.nextInt(20)
      } yield (u, rnd.nextInt(500).toLong, u * 1000 + i,
        Seq("a", "b")(rnd.nextInt(2)))
      val gap = 25L
      // reference: sort per user, split where delta > gap
      val ref = evs.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        var sid = 0L
        var prev = Long.MinValue / 2
        val bySession = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.Buffer[(Long, String)]]
        sorted.foreach { e =>
          if (e._2 - prev > gap) sid += 1
          prev = e._2
          bySession.getOrElseUpdate(sid,
            scala.collection.mutable.Buffer.empty) += ((e._2, e._4))
        }
        bySession.map { case (s, rows) =>
          (u, s) -> (rows.size.toLong, rows.map(_._1).min,
            rows.map(_._1).max - rows.map(_._1).min,
            rows.map(_._2).distinct.size.toLong)
        }
      }
      val got = Sessionize.sessions(
        evs.toDF("user_id", "ev_us", "event_id", "event_type"), gap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(got === ref)
    }
  }

  test("time-grid ffill equals the definitional as-of scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    for (_ <- 1 to 3) {
      val step = 10L
      val evs = for {
        u <- 1L to 20L
        i <- 0 until rnd.nextInt(8)
      } yield (u, rnd.nextInt(200).toLong, u * 100 + i,
        rnd.nextInt(1000) / 10.0)
      val ded = evs.groupBy(e => (e._1, e._2)).map { case (_, es) =>
        es.maxBy(_._3) // max event_id wins per (user, us)
      }.toSeq
      val ref = ded.groupBy(_._1).flatMap { case (u, es) =>
        val lo = es.map(_._2).min; val hi = es.map(_._2).max
        val k0 = (lo + step - 1) / step; val k1 = hi / step
        (k0 to k1).map { k =>
          val t = k * step
          val (_, us, _, v) = es.filter(_._2 <= t).maxBy(_._2)
          (u, t) -> (us, v)
        }
      }
      val got = TimeGrid.resampleFfill(
        evs.toDF("user_id", "ev_us", "event_id", "value"), step)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got === ref)
    }
  }

  test("cdc apply equals the definitional latest-op fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(777L)
    for (_ <- 1 to 3) {
      val changes = for {
        u <- 1L to 40L
        i <- 0 until rnd.nextInt(6)
      } yield (u, rnd.nextInt(100).toLong, u * 100 + i,
        Seq("I", "U", "D")(rnd.nextInt(3)), rnd.nextDouble())
      val ref = changes.groupBy(_._1).flatMap { case (u, cs) =>
        val last = cs.maxBy(c => (c._2, c._3))
        if (last._4 == "D") None else Some(u -> (last._5, last._2))
      }
      val got = Cdc.applyChangelog(
        changes.toDF("user_id", "ev_us", "event_id", "op", "value"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap
      assert(got === ref)
    }
  }
}
