package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance (Levenshtein) near-duplicate pairs — the
  * fuzzy-dedup operator of a training-data pipeline, shaped for scale:
  * an exact all-pairs Levenshtein is O(n² · len²) and unrunnable past
  * toy corpora, so candidates are generated from an inverted index of
  * RARE character 8-grams (document frequency ≤ `maxGramDF`, the same
  * stop-shingle cap as the Jaccard pipeline) with a minimum co-rare-gram
  * count, then only candidates are rescored with the exact (codegen'd
  * built-in) `levenshtein`, under a length-band prefilter (edit distance
  * ≥ |len(a)−len(b)|, so the band never rejects a true pair).
  *
  * Candidate-generation cost is Σ df(g)² over rare grams — linear-ish
  * in corpus size — and rescore cost scales with candidates found, not
  * n². The ≥ `minSharedGrams` requirement is part of the operator's
  * declared semantics (pairs that share almost no rare context are not
  * fuzzy duplicates); with d ≤ 30 edits over ~300-char docs, true
  * near-dups share dozens of rare grams, and the DuckDB oracle computes
  * the identical definition, so the gate is hash-exact.
  */
object FuzzyDedup {

  /** (doc_a, doc_b, edit_dist) for candidate pairs with
    * levenshtein ≤ maxDist. */
  def levenshteinPairs(docs: DataFrame, maxDist: Int = 30,
      maxGramDF: Long = 12L, minSharedGrams: Long = 3L,
      gramLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Per-doc DISTINCT gram set via the typed k-gram kernel. A
    // column-expression `transform(sequence, substring(text, i, k))`
    // pays an O(position) UTF8 boundary scan per gram = O(len²) per
    // doc — measured 6× slower than this narrow pass. Join currency
    // is the md5-60 long (8 bytes, and what the DuckDB oracle
    // recomputes). Scanned exactly once, by the posting-list agg below.
    val grams = TextAnalysis.balanced(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        TextAnalysis.md5GramHashes(text, gramLen).distinct
          .iterator.map(h => (id, h))
      })
      .toDF("doc_id", "g")
    // Posting-list candidate generation in ONE pass over the gram
    // stream: aggregate each gram's doc list with the skew-capped
    // BoundedCollectAgg (buffer never exceeds maxGramDF+1 longs, so a
    // corpus-frequency stop-gram can't hot-key an executor), keep only
    // true rare grams (complete lists: 2..maxGramDF), and explode the
    // ≤ maxGramDF² ordered pairs per gram inline. Replaces the earlier
    // cache + df-agg + rare-join + self-join chain — one shuffle on g
    // instead of three, and no cached n·grams-row intermediate pinned
    // in executor storage memory. The pair list (bounded by near-dups
    // found, not n²) is then localCheckpoint'd: the rescore join reads
    // it twice and a lost executor re-runs the query, not the
    // cluster's week.
    val candidates = grams.groupBy("g")
      .agg(graft.functions.BoundedCollectAgg
        .boundedCollect(maxGramDF.toInt + 1)(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxGramDF.toInt))
      .select(explode(expr(
        "flatten(transform(ids, a -> filter(transform(ids, b -> " +
          "struct(a AS doc_a, b AS doc_b)), p -> p.doc_a < p.doc_b)))"))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minSharedGrams)
      .select("doc_a", "doc_b")
      .localCheckpoint(true)
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    candidates.join(ta, "doc_a").join(tb, "doc_b")
      .filter(abs(length(col("text_a")) - length(col("text_b"))) <= maxDist)
      // 3-arg levenshtein runs the banded O(len·maxDist) DP and
      // returns -1 past the threshold — ~len/maxDist× cheaper than
      // the unbounded form on these docs
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b"), maxDist).as("edit_dist"))
      .filter(col("edit_dist") >= 0)
  }

  /** DuckDB oracle computing the identical blocked definition. */
  def levenshteinPairsSql(maxDist: Int = 30, maxGramDF: Long = 12L,
      minSharedGrams: Long = 3L, gramLen: Int = 8): String =
    s"""WITH grams AS (
       |  SELECT doc_id,
       |         CAST('0x' || substr(md5(substr(text, i, $gramLen)), 1, 15)
       |              AS BIGINT) AS g
       |  FROM documents,
       |       unnest(generate_series(1, len(text) - ${gramLen - 1})) t(i)
       |  GROUP BY 1, 2
       |), rare AS (
       |  SELECT g FROM grams GROUP BY g HAVING count(*) <= $maxGramDF
       |), cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM grams a JOIN rare USING (g) JOIN grams b USING (g)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $minSharedGrams
       |)
       |SELECT c.doc_a, c.doc_b,
       |       CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
       |FROM cand c JOIN documents da ON da.doc_id = c.doc_a
       |            JOIN documents db ON db.doc_id = c.doc_b
       |WHERE abs(len(da.text) - len(db.text)) <= $maxDist
       |  AND levenshtein(da.text, db.text) <= $maxDist""".stripMargin
}
