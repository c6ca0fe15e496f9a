package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultiRefEvalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Positional (even, odd) docs re-expressed as the keyed tables:
    * cand_id = the even doc_id, one reference per candidate. */
  private def asKeyed(docs: Seq[(Long, String)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val cands = df.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id").as("cand_id"), col("text"))
    val refs = df.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select((col("doc_id") - lit(1)).as("cand_id"),
        col("doc_id").as("ref_id"), col("text"))
    (cands, refs)
  }

  private val corpus = Seq(
    0L -> "the quick brown fox jumps over the lazy dog today",
    1L -> "the quick brown fox jumped over a lazy dog yesterday",
    2L -> "alpha beta gamma delta epsilon zeta",
    3L -> "alpha beta delta gamma zeta epsilon",
    4L -> "completely different words here now",
    5L -> "nothing shared at all between sides",
    6L -> "short one",
    7L -> "short one")

  test("single-reference inputs reproduce every positional gate score-for-score") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val (cands, refs) = asKeyed(corpus)

    def byPair[T](df: DataFrame, score: String): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getAs[Long](score)).toMap

    val rougePos = byPair(RougeL.rougeL(docs), "rouge_l_f_e6")
    val rougeMr = byPair(MultiRefEval.rougeL(cands, refs), "rouge_l_f_e6")
    assert(rougeMr === rougePos)

    val werPos = byPair(Wer.wer(docs), "wer_e6")
    val werMr = byPair(MultiRefEval.wer(cands, refs), "wer_e6")
    assert(werMr === werPos)

    val chrfPos = byPair(NgramEval.chrF(docs), "chrf_e6")
    val chrfMr = byPair(MultiRefEval.chrF(cands, refs), "chrf_e6")
    assert(chrfMr === chrfPos)

    val cfpPos = byPair(NgramEval.chrFpp(docs), "chrfpp_e6")
    val cfpMr = byPair(MultiRefEval.chrFpp(cands, refs), "chrfpp_e6")
    assert(cfpMr === cfpPos)

    val tfPos = byPair(NgramEval.tokenF1(docs), "token_f1_e6")
    val tfMr = byPair(MultiRefEval.tokenF1(cands, refs), "token_f1_e6")
    assert(tfMr === tfPos)

    val rnPos1 = byPair(RougeL.rougeN(docs), "rouge1_f_e6")
    val rnMr1 = byPair(MultiRefEval.rougeN(cands, refs), "rouge1_f_e6")
    assert(rnMr1 === rnPos1)
    val rnPos2 = byPair(RougeL.rougeN(docs), "rouge2_f_e6")
    val rnMr2 = byPair(MultiRefEval.rougeN(cands, refs), "rouge2_f_e6")
    assert(rnMr2 === rnPos2)

    // and every candidate reports exactly one scored reference
    assert(MultiRefEval.rougeL(cands, refs).select("n_refs").collect()
      .forall(_.getLong(0) === 1L))
  }

  test("max-F / min-WER reduction picks the best reference; n_refs counts scored refs") {
    import spark.implicits._
    val cands = Seq((0L, "a b c d")).toDF("cand_id", "text")
    val refs = Seq(
      (0L, 1L, "a b c d"),          // perfect match
      (0L, 2L, "a x y z"),          // poor match
      (0L, 3L, null.asInstanceOf[String])) // unusable -> not scored
      .toDF("cand_id", "ref_id", "text")
    val rl = MultiRefEval.rougeL(cands, refs).head()
    assert(rl.getAs[Long]("n_refs") === 2L)
    assert(rl.getAs[Long]("rouge_l_f_e6") === 1000000L) // the perfect ref wins
    val we = MultiRefEval.wer(cands, refs).head()
    assert(we.getAs[Long]("n_refs") === 2L)
    assert(we.getAs[Long]("wer_e6") === 0L) // min over refs
  }

  test("chrF multiref: n_refs counts only contract-satisfying refs (>= maxN chars both sides)") {
    import spark.implicits._
    val cands = Seq((0L, "abcdefgh stuv")).toDF("cand_id", "text")
    val refs = Seq(
      (0L, 1L, "abcdefgh wxyz"),    // scoreable, good overlap
      (0L, 2L, "abc"))              // < 6 chars -> dropped by contract
      .toDF("cand_id", "ref_id", "text")
    val out = MultiRefEval.chrF(cands, refs).head()
    assert(out.getAs[Long]("n_refs") === 1L)
    // and the score equals the positional chrF of the scoreable pair
    val pos = NgramEval.chrF(Seq(
      0L -> "abcdefgh stuv", 1L -> "abcdefgh wxyz").toDF("doc_id", "text"))
      .head().getAs[Long]("chrf_e6")
    assert(out.getAs[Long]("chrf_e6") === pos)
  }

  test("rougeN multiref: per-order maxima may come from DIFFERENT references") {
    import spark.implicits._
    val cands = Seq((0L, "a b c d")).toDF("cand_id", "text")
    val refs = Seq(
      (0L, 1L, "x a b y"),   // rouge1 2/4 -> 500000, rouge2 {ab} -> 333333
      (0L, 2L, "a c b d"))   // rouge1 4/4 -> 1e6,    rouge2 none -> 0
      .toDF("cand_id", "ref_id", "text")
    val out = MultiRefEval.rougeN(cands, refs).head()
    assert(out.getAs[Long]("n_refs") === 2L)
    assert(out.getAs[Long]("rouge1_f_e6") === 1000000L) // ref 2 wins order 1
    assert(out.getAs[Long]("rouge2_f_e6") === 333333L)  // ref 1 wins order 2
  }

  test("token-F1 multiref: max F1 and max EM may come from DIFFERENT references") {
    import spark.implicits._
    val cands = Seq((0L, "a b")).toDF("cand_id", "text")
    val refs = Seq(
      (0L, 1L, "a b"),        // exact match, F1 = 1
      (0L, 2L, "a b c"))      // no EM, F1 = 4/5
      .toDF("cand_id", "ref_id", "text")
    val out = MultiRefEval.tokenF1(cands, refs).head()
    assert(out.getAs[Long]("n_refs") === 2L)
    assert(out.getAs[Long]("token_f1_e6") === 1000000L)
    assert(out.getAs[Long]("exact_match") === 1L)
    // remove the exact ref: EM drops to 0, F1 to 2*2/(2+3)
    val out2 = MultiRefEval.tokenF1(cands,
      refs.filter(col("ref_id") === 2L)).head()
    assert(out2.getAs[Long]("exact_match") === 0L)
    assert(out2.getAs[Long]("token_f1_e6") === 800000L)
  }

  test("DuckDB mirrors match the Spark side row-for-row (2-3 refs, NULL ref, ties)") {
    import graft.util.DuckBridgeTestUtil
    assume(DuckBridgeTestUtil.duckAvailable)
    import spark.implicits._
    val cands = Seq(
      (0L, "the cat sat on the mat today fine"),
      (4L, "alpha beta gamma delta"),
      (8L, null.asInstanceOf[String]))
    val refs = Seq(
      (0L, 1L, "the cat sat on a mat today fine"),
      (0L, 2L, "a dog stood on the mat"),
      (0L, 3L, null.asInstanceOf[String]),
      (4L, 5L, "alpha beta gamma delta"),
      (4L, 6L, "alpha gamma beta delta"),
      (8L, 9L, "unscoreable candidate"))
    val cdf = cands.toDF("cand_id", "text")
    val rdf = refs.toDF("cand_id", "ref_id", "text")
    val cVals = cands.map { case (i, t) =>
      if (t == null) s"($i, NULL)" else s"($i, '$t')" }.mkString(", ")
    val rVals = refs.map { case (i, j, t) =>
      if (t == null) s"($i, $j, NULL)" else s"($i, $j, '$t')" }.mkString(", ")
    val cFrom = s"(SELECT * FROM (VALUES $cVals) t(cand_id, text))"
    val rFrom = s"(SELECT * FROM (VALUES $rVals) t(cand_id, ref_id, text))"

    def sparkMap(df: DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) ->
        (1 until r.length).map(r.getLong).toSeq).toMap
    def duckMap(sql: String): Map[Long, Seq[Long]] =
      DuckBridgeTestUtil.duck(sql)
        .map(r => r(0).get.toLong -> r.tail.map(_.get.toLong).toSeq).toMap

    val pairsChecks: Seq[(DataFrame, String)] = Seq(
      MultiRefEval.rougeL(cdf, rdf) ->
        MultiRefEval.rougeLSql(candsFrom = cFrom, refsFrom = rFrom),
      MultiRefEval.wer(cdf, rdf) ->
        MultiRefEval.werSql(candsFrom = cFrom, refsFrom = rFrom),
      MultiRefEval.chrF(cdf, rdf) ->
        MultiRefEval.chrFSql(candsFrom = cFrom, refsFrom = rFrom),
      MultiRefEval.chrFpp(cdf, rdf) ->
        MultiRefEval.chrFppSql(candsFrom = cFrom, refsFrom = rFrom),
      MultiRefEval.tokenF1(cdf, rdf) ->
        MultiRefEval.tokenF1Sql(candsFrom = cFrom, refsFrom = rFrom),
      MultiRefEval.rougeN(cdf, rdf) ->
        MultiRefEval.rougeNSql(candsFrom = cFrom, refsFrom = rFrom))
    pairsChecks.zipWithIndex.foreach { case ((df, sql), i) =>
      val s = sparkMap(df)
      assert(s.nonEmpty, s"metric #$i produced no rows")
      assert(duckMap(sql) === s, s"metric #$i mirror mismatch")
      assert(s.keySet === Set(0L, 4L), s"metric #$i keyset")
    }
  }
}
