package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-corpus gate-path contract: a builder embeds SfTagToken in
  * static oracle SQL, the gate fn derives the same tag from its data
  * dir at run time, and Verify resolves the token at dump time — these
  * three must agree or the oracle reads a different artifact tree than
  * the run wrote (the r8 interference class). */
class VerifyResolveSpec extends AnyFunSuite {
  import graft.util.Tables.{SfTagToken, corpusTag}

  test("token resolves to the tag a gate fn computes from the same dir") {
    val dir = "/root/testdata/sf0.01"
    val sql = s"SELECT * FROM read_parquet('/tmp/graft_gate_m_$SfTagToken/*.parquet')"
    assert(Verify.resolveOracleSql(sql, dir) ===
      s"SELECT * FROM read_parquet('/tmp/graft_gate_m_${corpusTag(dir)}/*.parquet')")
    assert(!Verify.resolveOracleSql(sql, dir).contains(SfTagToken))
  }

  test("distinct corpora get distinct, path-safe tags") {
    val tags = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1", "/tmp/graft_scale_x4").map(corpusTag)
    assert(tags.distinct.size === tags.size)
    tags.foreach { t =>
      assert(t.matches("[A-Za-z0-9._-]+"), s"tag not path-safe: $t")
    }
    // SQL without the token passes through untouched
    assert(Verify.resolveOracleSql("SELECT 1", "/x") === "SELECT 1")
  }

  test("the unigram gate's registered oracle carries the token") {
    val sql = SparkEntry.oracleSql("pipeline_unigram_encode")
    assert(sql.contains(SfTagToken),
      "pipeline_unigram_encode oracle must stay per-corpus")
  }
}
