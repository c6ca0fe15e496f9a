package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** The smoothed-KN probability for one (w1, w2) from hand counts:
    * Pcont add-α over Vcont+1 outcomes (see [[KneserNey]] scaladoc). */
  private def knP(c2: Long, c1: Long, n1Fwd: Long, n1Bwd: Long,
      nBi: Double, vCont: Double, d: Double, a: Double = 0.5): Double =
    math.max(c2 - d, 0.0) / c1 +
      d * n1Fwd / c1 * ((n1Bwd + a) / (nBi + a * (vCont + 1.0)))

  test("interpolated-KN terms match the closed form on a tiny corpus") {
    import spark.implicits._
    // One train doc "a b a c", one test doc "a b x".
    // Train bigrams: (a,b)=1, (b,a)=1, (a,c)=1.
    // ctx: a -> c1=2, n1_fwd=2 ; b -> c1=1, n1_fwd=1
    // cont: b -> 1, a -> 1, c -> 1 ; n_bi = 3 (types), v_cont = 3
    val d = 0.75
    // Expected per-term values for test bigrams (a,b) and (b,x):
    val pAB = knP(1, 2, 2, 1, 3.0, 3.0, d)          // seen ctx a
    val pBX = knP(0, 1, 1, 0, 3.0, 3.0, d)          // seen ctx b, unseen cont x
    assert(pBX > 0.0)  // totality: the OOV-bucket smoothing floor
    val expSum = BigDecimal(math.round(math.log(pAB) * 1e6) / 1e6) +
      BigDecimal(math.round(math.log(pBX) * 1e6) / 1e6)
    // The split is the md5-hash assignment, so pick ids that land on
    // the needed sides (first train id and first test id under 200).
    val ids = spark.range(200).toDF("doc_id")
      .select(col("doc_id"), CorpusPipeline.splitExpr(0.9).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val trainId = ids.collectFirst { case (i, "train") => i }.get
    val testId = ids.collectFirst { case (i, "test") => i }.get
    val corpus = Seq((trainId, "a b a c"), (testId, "a b x"))
      .toDF("doc_id", "text")
    val got = KneserNey.bigramKn(corpus).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(0) === testId)
    assert(r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - expSum.toDouble) < 1e-9,
      s"sum_kn_logprob ${r.getDouble(2)} vs $expSum")
  }

  test("seen-context KN mass sums to 1 over vocab + the OOV bucket") {
    // Probability-mass identity: for a context w1 with train count
    // c(w1·), Σ_{w2 ∈ vocab ∪ {oov}} P(w2|w1) = 1 exactly — the
    // discount mass D·N1+(w1,·)/c1 is redistributed by the smoothed
    // Pcont, which sums to 1 over Vcont + 1 outcomes by construction.
    val d = 0.75
    // train text: "a b a c b a" -> bigrams (a,b),(b,a),(a,c),(c,b),(b,a)
    // c2: (a,b)=1 (b,a)=2 (a,c)=1 (c,b)=1 ; types: 4, v_cont = {b,a,c}=3
    // ctx a: c1=2, n1fwd=2 ; ctx b: c1=2, n1fwd=1 ; ctx c: c1=1, n1fwd=1
    // cont: b<-{a,c}=2, a<-{b}=1, c<-{a}=1 ; n_bi = 4
    def p(c2: Long, c1: Long, nf: Long, nb: Long) =
      knP(c2, c1, nf, nb, 4.0, 3.0, d)
    // per context: vocab terms a, b, c plus the nb=0 OOV bucket term
    val sumA = p(1, 2, 2, 2) + p(0, 2, 2, 1) + p(1, 2, 2, 1) + p(0, 2, 2, 0)
    val sumB = p(2, 2, 1, 1) + p(0, 2, 1, 2) + p(0, 2, 1, 1) + p(0, 2, 1, 0)
    val sumC = p(1, 1, 1, 2) + p(0, 1, 1, 1) + p(0, 1, 1, 1) + p(0, 1, 1, 0)
    assert(math.abs(sumA - 1.0) < 1e-12)
    assert(math.abs(sumB - 1.0) < 1e-12)
    assert(math.abs(sumC - 1.0) < 1e-12)
  }

  test("scores are total (no null terms) and repartition-invariant on the corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = KneserNey.bigramKn(corpus).orderBy("doc_id").collect()
    val b = KneserNey.bigramKn(corpus.repartition(13)).orderBy("doc_id").collect()
    assert(a.nonEmpty)
    assert(a.map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
      b.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    assert(a.forall(r => !r.isNullAt(2) && !r.isNullAt(3)))
    // log-probs of a smoothed model are strictly negative
    assert(a.forall(_.getDouble(3) < 0.0))
  }
}
