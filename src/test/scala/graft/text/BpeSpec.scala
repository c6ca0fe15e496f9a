package graft.text

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def merges(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    Bpe.learnMerges(df, rounds).orderBy("merge_round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("classic low/lower/lowest corpus: hand-computed first 4 merges") {
    // word freqs: low=3, lower=1, lowest=1
    val got = merges(docs("low low low lower lowest"), 4)
    // r1: (l,o)=5 ties (o,w)=5 -> lexicographic left wins
    // r2: (lo,w)=5
    // r3: (low,e)=2
    // r4: (lowe,r)=1 ties (lowe,s)=1 and (s,t)=1 -> (lowe,r)
    assert(got.toSeq === Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "low", "e", 2L),
      (4, "lowe", "r", 1L)))
  }

  test("overlapping pair counting and leftmost-non-overlap merge (aaaa)") {
    // "aaaa": (a,a) counted positionally = 3; merge yields aa|aa,
    // so round 2 sees (aa,aa)=1
    val got = merges(docs("aaaa"), 2)
    assert(got.toSeq === Seq(
      (1, "a", "a", 3L),
      (2, "aa", "aa", 1L)))
  }

  test("odd-length run merges leftmost and leaves the tail (aaa + ab)") {
    // freqs: aaa=1 -> (a,a)=2; ab=1 -> (a,b)=1
    // r1 merges (a,a): aaa -> aa|a ; r2: candidates (aa,a)=1, (a,b)=1
    //   -> lexicographic: (a,b) < (aa,a) at equal counts
    val got = merges(docs("aaa ab"), 2)
    assert(got.toSeq === Seq(
      (1, "a", "a", 2L),
      (2, "a", "b", 1L)))
  }

  test("merges never cross word boundaries") {
    // "ab" and "ba" adjacent in text: pair (b,a) must NOT appear
    // across the space
    val got = merges(docs("ab ab ba"), 1)
    assert(got.head === ((1, "a", "b", 2L)))
  }

  test("exhausted vocab stops early instead of erroring") {
    val got = merges(docs("ab ab"), 5)
    // r1: (a,b)=2 -> single symbol "ab"; no pairs remain
    assert(got.toSeq === Seq((1, "a", "b", 2L)))
  }

  test("encode kernel: token counts and leftmost-merge application") {
    // merges (a,a) then (aa,b): "aaab" -> aa,a,b -> aa,ab? NO:
    //   (a,a): a a a b -> aa a b ; (aa,b): aa a b has no adjacent
    //   (aa,b) pair (aa then a) -> stays 3 tokens
    // "aab"  -> aa b -> aab (1 token)
    val enc = Bpe.encode(docs("aaab aab", "aab"),
        Seq(("a", "a"), ("aa", "b")))
      .orderBy("doc_id").collect()
    assert(enc.map(_.getAs[Long]("n_tokens")).toSeq === Seq(3L + 1L, 1L))
    // doc0 stream "aa a b aab", doc1 stream "aab" -> different digests
    assert(enc(0).getAs[String]("tokens_md5") !==
      enc(1).getAs[String]("tokens_md5"))
  }

  test("train-then-encode: every doc keeps a row, tokens <= chars") {
    val df = docs("low lower lowest", "aaaa aaa low", "zz qq zz")
    val enc = Bpe.trainAndEncode(df, 3).collect()
    assert(enc.length === 3)
    enc.foreach(r => assert(r.getAs[Long]("n_tokens") > 0))
  }

  test("unicode symbols stay whole: merges operate on chars, not bytes") {
    // "héhé": chars h,é,h,é -> (h,é)=2 wins round 1, (hé,hé)=1 round 2
    val got = merges(docs("héhé"), 2)
    assert(got.toSeq === Seq((1, "h", "é", 2L), (2, "hé", "hé", 1L)))
    val enc = Bpe.encode(docs("héhé", "né"), Seq(("h", "é")))
      .orderBy("doc_id").collect()
    assert(enc.map(_.getAs[Long]("n_tokens")).toSeq === Seq(2L, 2L))
  }

  test("empty-word-only docs are dropped from the encoding") {
    val enc = Bpe.encode(docs("", "ab"), Seq(("a", "b"))).collect()
    assert(enc.length === 1)
    assert(enc(0).getAs[Long]("n_tokens") === 1L)
  }

  test("encodeStream marks word starts; decode inverts exactly") {
    val df = docs("the cat sat", "aaab aab", "  spaced   out ")
    val ms = Seq(("t", "h"), ("th", "e"), ("a", "a"))
    val enc = Bpe.encodeStream(df, ms).orderBy("doc_id").collect()
    // doc0: "the"→[the? no: (t,h)→th, (th,e)→the] = 1 token
    val s0 = enc(0).getAs[String]("tok_stream")
    assert(s0 === "Ġthe Ġc a t Ġs a t")
    val dec = Bpe.decode(Bpe.encodeStream(df, ms))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    // roundtrip = source modulo single-space word joining
    assert(dec.toSeq === Seq((0L, "the cat sat"), (1L, "aaab aab"),
      (2L, "spaced out")))
  }

  test("decode is merge-independent: any merge list roundtrips") {
    val df = docs("mixed lengths here ok", "zz")
    for (ms <- Seq(Seq.empty[(String, String)], Seq(("z", "z")),
        Seq(("e", "n"), ("h", "e"), ("he", "r")))) {
      val dec = Bpe.decode(Bpe.encodeStream(df, ms))
        .orderBy("doc_id").collect().map(_.getString(1))
      assert(dec.toSeq === Seq("mixed lengths here ok", "zz"), s"merges=$ms")
    }
  }

  test("encodeStream rejects text containing the reserved marker") {
    val ex = intercept[org.apache.spark.SparkException] {
      Bpe.encodeStream(docs("bad Ġ token"), Seq.empty).collect()
    }
    assert(ex.getMessage.contains("marker") ||
      ex.getCause != null && ex.getCause.getMessage.contains("marker"))
  }
}
