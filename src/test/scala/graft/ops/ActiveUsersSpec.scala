package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class ActiveUsersSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case: dau, trailing wau, stickiness") {
    import spark.implicits._
    // period=10, w=2. u1 active p0,p1; u2 active p0; u3 active p2.
    // dau: p0=2, p1=1, p2=1
    // wau(2): p0={u1,u2}=2, p1={u1(p0,p1),u2(p0)}... wau(p)=distinct
    //   users active in {p-1, p}: p1={u1,u2}=2, p2={u1,u3}=2
    val ev = Seq((1L, 5L), (1L, 15L), (2L, 3L), (3L, 25L))
      .toDF("u", "us")
    val out = ActiveUsers.stickiness(ev, "u", "us", 10L, w = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      0L -> ((2L, 2L, 1.0)),
      1L -> ((1L, 2L, 0.5)),
      2L -> ((1L, 2L, 0.5))))
  }

  test("invariants: dau <= wau <= sum of window dau; w=1 degenerates") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val ev = (1 to 3000).map(_ => (rnd.nextInt(80).toLong,
      rnd.nextInt(2000).toLong)).toDF("u", "us")
    val rows = ActiveUsers.stickiness(ev, "u", "us", 100L, w = 7)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (p, (dau, wau, st)) =>
      assert(dau <= wau, s"period $p")
      val windowDauSum = (0L until 7L)
        .flatMap(off => rows.get(p - off).map(_._1)).sum
      assert(wau <= windowDauSum, s"period $p")
      assert(st > 0.0 && st <= 1.0)
    }
    // w=1: wau == dau, stickiness 1 everywhere
    ActiveUsers.stickiness(ev, "u", "us", 100L, w = 1)
      .collect().foreach { r =>
        assert(r.getLong(1) === r.getLong(2))
        assert(r.getDouble(3) === 1.0)
      }
  }
}
