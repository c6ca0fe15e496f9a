package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed BPE tokenizer training (Sennrich-style byte-pair
  * encoding): learn the first N merge rules from corpus word
  * frequencies. The step every from-scratch pretraining run needs
  * before a single token exists.
  *
  * Scale shape — the reason BPE training is cluster-friendly at
  * 100 TB: ONE corpus-wide shuffle builds the (word, freq) vocab;
  * every subsequent round iterates on the VOCAB ONLY (Zipf: ~10⁷ rows
  * for a web-scale corpus vs 10¹³ corpus tokens). Per round: pair
  * counts are a map-side-combined sum over the symbol table, the
  * argmax pair is a bounded 1-row driver artifact (like the IVF
  * centroids / Bloom filter precedents — never corpus rows), and the
  * merge rewrite is two windows riding one shuffle on `word`.
  * `localCheckpoint` truncates the per-round lineage.
  *
  * Merge semantics (mirrored exactly in the oracle): the best pair is
  * max count with lexicographic (left, right) tie-break; occurrences
  * merge leftmost-non-overlapping ("aaaa" + (a,a) → "aa","aa").
  * Overlap only arises when left = right, and is resolved with the
  * even-offset rule: within each run of consecutive candidate
  * positions, merge the 0th, 2nd, 4th… candidate. The run start is
  * recovered with a cumulative max over run-start flags, so EVERY
  * window in a round shares the one (word, pos) partitioning — a
  * single Exchange feeds the whole merge rewrite. Pair COUNTING is
  * positional (overlapping: "aaaa" counts (a,a) 3 times), matching
  * the reference BPE implementation's get_stats. No end-of-word
  * marker is appended — merges never cross word boundaries because
  * symbols live inside (word, pos) rows.
  */
object Bpe {

  /** Initial symbol table: (word, freq, pos, sym) with one
    * single-character symbol per position. */
  private[text] def initSyms(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        posexplode(expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
          .as(Seq("pos", "sym")))

  /** Learn `rounds` merge rules; returns (merge_round, merge_left,
    * merge_right, pair_count) — the merge table a tokenizer ships. */
  def learnMerges(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wOrd = Window.partitionBy("word").orderBy("pos")
    var syms = initSyms(docs).localCheckpoint(true)
    var prevSyms: DataFrame = null
    val merges = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = syms.withColumn("nxt", lead(col("sym"), 1).over(wOrd))
      val bestRows = pairs.where(col("nxt").isNotNull)
        .groupBy(col("sym").as("l"), col("nxt").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (bestRows.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, rt, c) = (bestRows(0).getString(0), bestRows(0).getString(1),
          bestRows(0).getLong(2))
        merges += ((r, l, rt, c))
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        prevSyms = syms
        syms = pairs
          .withColumn("is_cand",
            coalesce(col("sym") === lit(l) && col("nxt") === lit(rt), lit(false)))
          .withColumn("run_start", col("is_cand") &&
            !coalesce(lag(col("is_cand"), 1).over(wOrd), lit(false)))
          .withColumn("run_pos",
            max(when(col("run_start"), col("pos"))).over(wCum))
          .withColumn("mh", col("is_cand") &&
            (col("pos") - col("run_pos")) % 2 === 0)
          .withColumn("consumed",
            coalesce(lag(col("mh"), 1).over(wOrd), lit(false)))
          .where(!col("consumed"))
          .withColumn("sym2",
            when(col("mh"), concat(col("sym"), col("nxt"))).otherwise(col("sym")))
          .withColumn("pos2", row_number().over(wOrd) - 1)
          .select(col("word"), col("freq"), col("pos2").as("pos"),
            col("sym2").as("sym"))
          .localCheckpoint(true)
        // the new checkpoint is materialized (eager=true) — release
        // the previous round's blocks instead of pinning `rounds`
        // generations of the symbol table
        prevSyms.unpersist(false)
      }
      r += 1
    }
    syms.unpersist(false) // the merge table is the artifact, not the syms
    merges.toSeq.toDF("merge_round", "merge_left", "merge_right", "pair_count")
  }

  /** Tokenize a corpus with a learned merge list — the production
    * encode path. Unlike training (vocab-table windows), encoding is
    * embarrassingly parallel: a mapPartitions kernel applies the
    * broadcast merge list per word with a per-partition memo cache
    * (Zipf: the hot words hit the cache, so the per-word scan-merge
    * cost amortizes to ~zero across a partition). Output per doc:
    * subword token count + digest of the space-joined token stream
    * (symbols never contain spaces — words were split on them — so
    * the join is unambiguous). Empty-word-only docs are dropped,
    * mirroring the oracle's join semantics.
    *
    * The leftmost-non-overlapping sequential scan per merge is
    * EXACTLY the even-offset run rule the training rewrite applies —
    * the gate query proves the imperative kernel ≡ the declarative
    * windows by hash-matching the oracle, which encodes via the
    * unrolled training CTEs (a word's final symbol sequence IS its
    * encoding). */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val encoded = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        // bounded memo: distinct words per partition is vocab-sized,
        // but a pathological partition (all-unique synthetic ids)
        // could grow without limit — epoch-clear past 1M entries
        // (pure function: clearing only costs recompute)
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def applyMerges(word: String): Array[String] = {
          if (memo.size > (1 << 20)) memo.clear()
          memo.getOrElseUpdate(word, {
            var syms: Array[String] = word.map(_.toString).toArray
            for ((l, r) <- ms) {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                  out += l + r; i += 2
                } else { out += syms(i); i += 1 }
              }
              syms = out.toArray
            }
            syms
          })
        }
        it.flatMap { case (docId, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          if (words.isEmpty) Iterator.empty
          else {
            val toks = words.iterator.flatMap(applyMerges)
            val sb = new StringBuilder
            var n = 0L
            toks.foreach { t =>
              if (n > 0) sb += ' '
              sb ++= t; n += 1
            }
            Iterator.single((docId, n, sb.toString))
          }
        }
      }.toDF("doc_id", "n_tokens", "tok_stream")
    encoded.select(col("doc_id"), col("n_tokens"),
      md5(col("tok_stream").cast("binary")).as("tokens_md5"))
  }

  /** GPT-2-style word-start marker: prefixed to the FIRST token of
    * every word after merges are applied, so the flat token stream
    * keeps word boundaries and [[decode]] is exact. U+0120 (Ġ) — the
    * actual byte-level-BPE convention — never appears in the synthetic
    * ASCII corpus; encodeStream guards the assumption per row. */
  val WordStartMarker = "Ġ"

  /** Tokenize to the FULL marked token stream (one row per doc,
    * space-joined tokens, first token of each word carrying
    * [[WordStartMarker]]). Same mapPartitions kernel + memo as
    * [[encode]] — embarrassingly parallel, zero shuffles. Docs whose
    * text contains the marker character are rejected (would corrupt
    * word boundaries silently); empty-word-only docs are dropped as in
    * [[encode]]. */
  def encodeStream(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def applyMerges(word: String): Array[String] = {
          if (memo.size > (1 << 20)) memo.clear()
          memo.getOrElseUpdate(word, {
            var syms: Array[String] = word.map(_.toString).toArray
            for ((l, r) <- ms) {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                  out += l + r; i += 2
                } else { out += syms(i); i += 1 }
              }
              syms = out.toArray
            }
            syms
          })
        }
        it.flatMap { case (docId, text) =>
          require(!text.contains(WordStartMarker),
            s"doc $docId contains the reserved word-start marker U+0120")
          val words = text.split(" ").filter(_.nonEmpty)
          if (words.isEmpty) Iterator.empty
          else {
            val sb = new StringBuilder
            var first = true
            words.foreach { w =>
              val toks = applyMerges(w)
              var i = 0
              while (i < toks.length) {
                if (!first) sb += ' '
                if (i == 0) sb ++= WordStartMarker
                sb ++= toks(i)
                first = false; i += 1
              }
            }
            Iterator.single((docId, sb.toString))
          }
        }
      }.toDF("doc_id", "tok_stream")
  }

  /** Invert [[encodeStream]]: concatenate tokens, opening a new word at
    * every marker — pure string fold, no merge table needed (BPE
    * decode is merge-free by construction; that's the property the
    * roundtrip gate pins). Returns (doc_id, text) with words joined by
    * single spaces. */
  def decode(encoded: DataFrame): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.select(col("doc_id"), col("tok_stream")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, stream) =>
          val sb = new StringBuilder
          stream.split(" ").foreach { tok =>
            if (tok.startsWith(WordStartMarker)) {
              if (sb.nonEmpty) sb += ' '
              sb ++= tok.substring(WordStartMarker.length)
            } else sb ++= tok
          }
          (docId, sb.toString)
        }
      }.toDF("doc_id", "text")
  }

  /** Train-then-encode in one call (the gate shape): learn `rounds`
    * merges from the corpus itself, then tokenize it. */
  def trainAndEncode(docs: DataFrame, rounds: Int): DataFrame = {
    val merges = learnMerges(docs, rounds).orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    encode(docs, merges)
  }

  /** DuckDB oracle for [[trainAndEncode]]: run the training CTEs, then
    * read each word's encoding off the final symbol table and stitch
    * docs back together in word order. */
  def trainAndEncodeSql(rounds: Int,
      srcSql: String = "SELECT doc_id, text FROM documents"): String = {
    val train = learnMergesSql(rounds, s"SELECT text FROM ($srcSql) raw")
    // keep the training CTE chain, swap the final SELECT
    val cteOnly = train.substring(0, train.lastIndexOf("\nSELECT 1 AS merge_round"))
    s"""$cteOnly,
       |word_tokens AS (
       |  SELECT word, string_agg(sym, ' ' ORDER BY pos) AS toks,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM syms$rounds GROUP BY word),
       |doc_ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM ($srcSql) raw2),
       |doc_words AS (
       |  SELECT doc_id, CAST(i AS INT) AS widx, ws[CAST(i AS INT)] AS word
       |  FROM doc_ws, unnest(generate_series(1, CAST(len(ws) AS INT))) g(i)
       |  WHERE ws[CAST(i AS INT)] <> '')
       |SELECT d.doc_id, CAST(sum(wt.n) AS BIGINT) AS n_tokens,
       |  md5(string_agg(wt.toks, ' ' ORDER BY d.widx)) AS tokens_md5
       |FROM doc_words d JOIN word_tokens wt USING (word)
       |GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle: the identical algorithm with the `rounds`
    * iterations unrolled as chained CTEs (the TextRank precedent) —
    * pair lead, argmax with the same tie-break, islands even-offset
    * merge, positional re-densify. */
  def learnMergesSql(rounds: Int,
      srcSql: String = "SELECT text FROM documents"): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH src AS ($srcSql),
       |words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM src) t
       |  WHERE word <> '' GROUP BY 1),
       |syms0 AS (
       |  SELECT word, freq, CAST(i - 1 AS INT) AS pos,
       |    substring(word, CAST(i AS INT), 1) AS sym
       |  FROM words, unnest(generate_series(1, CAST(length(word) AS INT))) g(i))""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
         |pairs$r AS (
         |  SELECT word, freq, pos, sym,
         |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM syms${r - 1}),
         |best$r AS (
         |  SELECT sym AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM pairs$r WHERE nxt IS NOT NULL GROUP BY 1, 2
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |mk$r AS (
         |  SELECT *, is_cand AND ((pos - run_pos) % 2 = 0) AS mh
         |  FROM (
         |    SELECT *, max(CASE WHEN run_start THEN pos END) OVER
         |        (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run_pos
         |    FROM (
         |      SELECT *, is_cand AND NOT coalesce(lag(is_cand) OVER
         |          (PARTITION BY word ORDER BY pos), false) AS run_start
         |      FROM (
         |        SELECT p.word, p.freq, p.pos, p.sym, p.nxt,
         |          coalesce(p.sym = b.l AND p.nxt = b.r, false) AS is_cand
         |        FROM pairs$r p, best$r b) c) z1) z),
         |syms$r AS (
         |  SELECT word, freq,
         |    CAST(row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS INT) AS pos,
         |    CASE WHEN mh THEN sym || nxt ELSE sym END AS sym
         |  FROM (
         |    SELECT *, coalesce(lag(mh) OVER (PARTITION BY word ORDER BY pos),
         |      false) AS consumed
         |    FROM mk$r) zz
         |  WHERE NOT consumed)""".stripMargin
    }
    sb ++= (1 to rounds).map(r =>
      s"SELECT $r AS merge_round, l AS merge_left, r AS merge_right, " +
        s"cnt AS pair_count FROM best$r").mkString("\n", "\nUNION ALL ", "")
    sb.toString
  }
}
