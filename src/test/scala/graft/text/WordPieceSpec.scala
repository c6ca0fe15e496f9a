package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def vocabDf(pieces: String*) = {
    import spark.implicits._
    Seq(pieces).toDF("vocab")
  }

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Run the Spark encoder on a 1-doc corpus and prove its EXACT piece
    * stream equals a driver-side greedy reference (via the md5 digest
    * the encoder emits); returns the reference stream for the caller's
    * readable assertions. */
  private def pieces(text: String, vocab: Seq[String]): Seq[String] = {
    val r = WordPiece.encodeWithVocab(docs(text), vocabDf(vocab: _*))
      .collect()(0)
    def greedy(w: String): Seq[String] = {
      var pos = 0
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (pos < w.length) {
        val maxL = math.min(WordPiece.MaxPieceLen, w.length - pos)
        val hit = (maxL to 1 by -1).find { l =>
          val raw = w.substring(pos, pos + l)
          vocab.contains(if (pos == 0) raw else "##" + raw)
        }
        hit match {
          case Some(l) =>
            val raw = w.substring(pos, pos + l)
            out += (if (pos == 0) raw else "##" + raw); pos += l
          case None => return Seq("[UNK]")
        }
      }
      out.toSeq
    }
    val expected = text.split(" ").toSeq.flatMap(greedy)
    assert(r.getLong(2) === expected.length.toLong, "n_pieces vs reference")
    assert(r.getLong(3) === expected.count(_ == "[UNK]").toLong,
      "n_unk vs reference")
    assert(r.getString(4) === md5Hex(expected.mkString(" ")),
      "piece stream md5 vs reference")
    expected
  }

  test("greedy longest-match-first with ## continuations") {
    // vocab has both "unaff" and "un": longest wins
    val v = Seq("un", "unaff", "##able", "##aff", "a", "##a", "b", "##b",
      "f", "##f", "l", "##l", "e", "##e", "n", "##n", "u", "##u")
    val got = pieces("unaffable", v)
    assert(got === Seq("unaff", "##able"))
  }

  test("whole-word vocab hit is a single piece; unknown char -> [UNK]") {
    val v = Seq("hello", "h", "##e", "##l", "##o", "e", "l", "o")
    assert(pieces("hello", v) === Seq("hello"))
    // 'z' has no piece in any form -> whole word UNK
    assert(pieces("hz", v) === Seq("[UNK]"))
  }

  test("char fallback covers words absent from the word vocab") {
    val v = Seq("h", "##e", "##l", "##o")
    assert(pieces("hello", v) === Seq("h", "##e", "##l", "##l", "##o"))
  }

  test("words longer than MaxPieceLen still encode fully (fold runs length(w) steps)") {
    // 12-char word from a char-only vocab: 12 greedy steps, piece
    // count = char count — the Spark fold is not bounded by the
    // oracle's 8-step unroll.
    val v = "abcdefghijkl".map(_.toString).flatMap(c => Seq(c, "##" + c))
    val got = pieces("abcdefghijkl", v)
    assert(got.length === 12)
    assert(got === Seq("a") ++ "bcdefghijkl".map("##" + _))
    // and a long word with a long-prefix piece: greedy takes the
    // 8-char cap first, then chars
    val v2 = Seq("abcdefgh") ++ v
    assert(pieces("abcdefghijkl", v2) ===
      Seq("abcdefgh", "##i", "##j", "##k", "##l"))
  }

  test("empty words (double/leading spaces) carry zero pieces and stay out of vocab") {
    import spark.implicits._
    val d = docs("a  b", " a b")
    // vocab built from this corpus must not contain '' in any form
    val vocab = WordPiece.buildVocab(d).collect()(0)
      .getSeq[String](0)
    assert(!vocab.contains(""))
    assert(!vocab.contains("##"))
    val out = WordPiece.encode(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // 3 split slots per doc, 2 real words, 2 pieces, no UNK — the
    // empty slot contributes nothing to the piece stream
    assert(out(0) === (3L, 2L, 0L, md5Hex("a b")))
    assert(out(1) === (3L, 2L, 0L, md5Hex("a b")))
    // all-empty doc: empty piece stream, md5('')
    val empty = WordPiece.encodeWithVocab(docs(""), vocabDf("x")).collect()(0)
    assert(empty.getLong(2) === 0L)
    assert(empty.getString(4) === md5Hex(""))
  }

  test("roundtrip rebuilds the exact text, UNK words fall back raw") {
    import spark.implicits._
    // corpus path: encode∘decode = id on every doc
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatches = WordPiece.roundtrip(corpus)
      .join(corpus, "doc_id")
      .where(col("roundtrip_md5") =!=
        md5(col("text").cast("binary"))).count()
    assert(mismatches === 0L)
    // foreign text with an un-tokenizable word: raw-word fallback
    // keeps the identity (vocab lacks 'z' entirely)
    val v = vocabDf("h", "##i")
    val enc = WordPiece.encodeWithVocab(docs("hi zz hi"), v).collect()(0)
    assert(enc.getLong(3) === 1L) // the 'zz' word is [UNK]
    val rt = WordPiece.roundtripWithVocab(docs("hi zz hi"), v).collect()(0)
    assert(rt.getString(1) === md5Hex("hi zz hi"))
  }

  test("corpus encode: zero UNK, pieces >= words, repartition-invariant") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = WordPiece.encode(corpus).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    // single chars in both forms are always in vocab -> BERT's
    // no-UNK-on-training-text property
    assert(a.forall(_._4 === 0L))
    assert(a.forall(r => r._3 >= r._2))
    val b = WordPiece.encode(corpus.repartition(7)).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(a === b)
  }

  test("fertility: per-lang rollup consistent with encode; exact on a hand corpus") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val f = WordPiece.fertility(corpus).collect()
    assert(f.nonEmpty)
    // rollup must reconcile with the raw encode joined the same way
    val enc = WordPiece.encode(corpus)
      .join(corpus.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang").agg(sum("n_pieces").as("p"), sum("n_words").as("w"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    f.foreach { r =>
      val (p0, w0) = (enc(r.getString(0))._1, enc(r.getString(0))._2)
      assert(r.getLong(3) === p0 && r.getLong(2) === w0)
      assert(r.getDouble(5) === p0.toDouble / w0.toDouble)
    }
    // hand corpus: every word single-piece (in top-64 vocab) -> fertility 1.0
    val tiny = Seq((0L, "aa bb aa", "en"), (1L, "bb bb", "fr"))
      .toDF("doc_id", "text", "lang")
    val tf = WordPiece.fertility(tiny).orderBy("lang").collect()
    assert(tf.map(_.getString(0)).toSeq === Seq("en", "fr"))
    assert(tf.forall(_.getDouble(5) === 1.0))
    assert(tf.forall(_.getDouble(6) === 0.0))
  }
}
