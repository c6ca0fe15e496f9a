package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("auc: perfect, inverted, and undefined groups") {
    import spark.implicits._
    // g=perf: all positives above all negatives → 1.0
    // g=inv: all positives below → 0.0
    // g=onlypos: no negatives → null
    val df = Seq(
      ("perf", 1.0, false), ("perf", 2.0, false), ("perf", 3.0, true),
      ("perf", 4.0, true),
      ("inv", 1.0, true), ("inv", 2.0, false),
      ("onlypos", 5.0, true), ("onlypos", 6.0, true))
      .toDF("g", "score", "lab")
    val out = Eval.aucRoc(df, "g", "score", "lab")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("perf") === Some(1.0))
    assert(out("inv") === Some(0.0))
    assert(out("onlypos") === None)
  }

  test("auc: tied scores use average ranks (hand case)") {
    import spark.implicits._
    // scores: pos at {2, 2}, neg at {1, 2, 3}
    // pairs: (p,n) concordant p>n, 0.5 for ties:
    //  p=2 vs n=1: 1, vs n=2: 0.5, vs n=3: 0  (×2 positives)
    // AUC = (2·1.5)/(2·3) = 0.5
    val df = Seq((2.0, true), (2.0, true), (1.0, false), (2.0, false),
      (3.0, false)).map { case (s, l) => ("g", s, l) }
      .toDF("g", "score", "lab")
    val auc = Eval.aucRoc(df, "g", "score", "lab").collect()(0).getDouble(3)
    assert(auc === 0.5)
  }

  test("auc: randomized parity vs brute-force pair counting") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = (1 to 400).map(_ =>
      ("g" + rnd.nextInt(3), rnd.nextInt(20).toDouble, rnd.nextBoolean()))
    val out = Eval.aucRoc(rows.toDF("g", "score", "lab"), "g", "score", "lab")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val pos = rs.filter(_._3).map(_._2)
      val neg = rs.filterNot(_._3).map(_._2)
      val num = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      val brute = num / (pos.size.toLong * neg.size)
      assert(math.abs(out(g) - brute) < 1e-12, s"group $g")
    }
  }

  test("gains: deciles are equal-count, capture ends at 1, lift averages 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 1000).map(i =>
        (i.toLong, rnd.nextDouble() * 100, rnd.nextInt(4) == 0))
      .toDF("id", "score", "lab")
    val rows = Eval.gains(df, "score", "id", "lab", buckets = 10)
      .orderBy("bucket").collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getLong(1) === 100L)) // 1000/10 exact
    assert(rows.last.getDouble(4) === 1.0)     // cum capture
    val nPos = rows.map(_.getLong(2)).sum
    // Σ lift·n/N = Σ np/NP = 1
    val liftWeighted = rows.map(r => r.getDouble(3) * r.getLong(1)).sum / 1000
    assert(math.abs(liftWeighted - 1.0) < 1e-9)
    assert(nPos === df.filter(col("lab")).count())
  }

  test("rankingMetrics: hand case (P@3, MRR, nDCG)") {
    import spark.implicits._
    // query q1, 5 candidates ranked by score desc:
    //   rank1 rel, rank2 not, rank3 rel, rank4 rel, rank5 not
    // P@3 = 2/3; MRR = 1/1; n_rel=3
    // DCG@3 = 1/log2(2) + 1/log2(4) = 1 + 0.5 = 1.5
    // IDCG@3 = 1 + 1/log2(3) + 0.5 = 1.5 + 0.630930
    val df = Seq(
      ("q1", 50.0, 1L, true), ("q1", 40.0, 2L, false),
      ("q1", 30.0, 3L, true), ("q1", 20.0, 4L, true),
      ("q1", 10.0, 5L, false),
      // q2: no relevant → all metrics 0
      ("q2", 9.0, 1L, false), ("q2", 8.0, 2L, false))
      .toDF("q", "score", "tie", "rel")
    val out = Eval.rankingMetrics(df, "q", "score", "tie", "rel", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val (nRel, p3, mrr, ndcg) = out("q1")
    assert(nRel === 3L)
    assert(p3 === 2.0 / 3.0)
    assert(mrr === 1.0)
    assert(math.abs(ndcg - 1.5 / (1.5 + 0.630930)) < 1e-9)
    assert(out("q2") === ((0L, 0.0, 0.0, 0.0)))
  }

  test("rankingMetrics: perfect ranking gives ndcg 1, mrr 1") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("q", (10 - i).toDouble, i.toLong, i <= 4))
      .toDF("q", "score", "tie", "rel")
    val r = Eval.rankingMetrics(df, "q", "score", "tie", "rel", k = 3)
      .collect()(0)
    assert(r.getDouble(3) === 1.0) // p@3: top-3 all relevant
    assert(r.getDouble(4) === 1.0)
    assert(r.getDouble(5) === 1.0) // dcg == idcg term-for-term
  }

  test("gains: top bucket holds the top scores (separable hand case)") {
    import spark.implicits._
    // positives are exactly the 20 highest scores → bucket 0 of 5
    // buckets (n=20) captures all of them, lift = 5
    val df = (1 to 100).map(i => (i.toLong, i.toDouble, i > 80))
      .toDF("id", "score", "lab")
    val rows = Eval.gains(df, "score", "id", "lab", buckets = 5)
      .orderBy("bucket").collect()
    assert(rows.head.getLong(2) === 20L)
    assert(rows.head.getDouble(3) === 5.0)
    assert(rows.head.getDouble(4) === 1.0)
    assert(rows.drop(1).forall(_.getLong(2) === 0L))
  }
}
