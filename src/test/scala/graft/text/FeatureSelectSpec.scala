package graft.text

import org.scalatest.funsuite.AnyFunSuite

class FeatureSelectSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("hand case: planted label-exclusive token tops its label") {
    import spark.implicits._
    // 6 docs: 'xx' appears in ALL 3 label-a docs and NO label-b docs;
    // 'zz' appears everywhere (no signal); fillers are per-doc noise.
    val docs = Seq(
      (1L, "a", "xx zz f1"), (2L, "a", "xx zz f2"), (3L, "a", "xx zz f3"),
      (4L, "b", "zz f4 f5"), (5L, "b", "zz f6 f7"), (6L, "b", "zz f8 f9"))
      .toDF("doc_id", "lang", "text")
    // k = 10 keeps every token in view (the per-doc fillers score 1.2,
    // above zz's 0.0, so a small k would crowd zz out of the window)
    val out = FeatureSelect.chi2Terms(docs, "doc_id", "text", "lang",
      k = 10, minDf = 1L)
      .collect().map(r => (r.getString(0), r.getInt(5)) ->
        (r.getString(1), r.getDouble(4))).toMap
    // perfect 2x2 split: a=3,b=0,c=0,d=3 → chi2 = 6·(9)²/(3·3·3·3) = 6
    assert(out(("a", 1)) === (("xx", 6.0)))
    // 'zz' is in every doc → chi2 0 for both labels
    val zz = out.filter(_._2._1 == "zz")
    assert(zz.nonEmpty && zz.values.forall(_._2 === 0.0))
  }

  test("invariants: minDf bound, rank window, non-negative statistic") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val docs = (1 to 200).map { i =>
      val lab = if (rnd.nextBoolean()) "p" else "q"
      val toks = (1 to 10).map(_ => s"${lab}w${rnd.nextInt(8)}") ++
        (1 to 5).map(_ => s"cw${rnd.nextInt(6)}")
      (i.toLong, lab, toks.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val rows = FeatureSelect.chi2Terms(docs, "doc_id", "text", "lang",
      k = 5, minDf = 4L).collect()
    assert(rows.nonEmpty)
    val perLabel = rows.groupBy(_.getString(0))
    perLabel.values.foreach { rs =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(5)).sorted.toSeq === (1 to rs.length))
    }
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0)
      assert(r.getLong(3) >= 4L) // df_token >= minDf
      assert(r.getLong(2) <= r.getLong(3))
    }
    // label-exclusive vocab should dominate the shared 'cw*' fillers
    assert(rows.filter(_.getInt(5) == 1)
      .forall(r => r.getString(1).startsWith(r.getString(0))))
  }
}
