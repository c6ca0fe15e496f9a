package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the lexical-search half of
  * a training-data / RAG pipeline (the dense half is sim.Knn).
  *
  * Plan shape at 100 TB: one token-explode scan feeds term
  * frequencies, doc lengths, and document frequencies; the query-term
  * filter prunes the tf table BEFORE any join (a handful of terms →
  * the scored table is tiny regardless of corpus size); corpus-level
  * scalars (N, avg doc length) ride along as a broadcast. The final
  * per-doc sum adds 6-dp-rounded per-term scores as DECIMAL, so the
  * result is independent of float summation order — which is also
  * what lets DuckDB reproduce it bit-for-bit (every other step is
  * per-row double math; the Lucene-style idf uses ln).
  */
object Bm25 {

  /** Top-`topK` docs for `terms`, scored with BM25 (k1, b defaults per
    * Robertson/Lucene). Output: (doc_id, score, n_terms_hit). */
  def topDocs(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    // ONE corpus pass builds the (doc, term, count) posting list —
    // the inverted-index materialization a lexical engine keeps
    // anyway; dl (Σ counts per doc), avgdl, and df (rows per term)
    // all derive from it, so the explode never re-executes
    // (scan-censused 4 corpus scans without this)
    val tfL = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tf = tfL.select(col("doc_id"), col("w"),
      col("c").cast("double").as("tf"))
    val dl = tfL.groupBy("doc_id")
      .agg(sum(col("c")).cast("double").as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl").cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val dfT = tfL.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    tf.filter(col("w").isin(terms: _*))
      .join(dl, "doc_id")
      .join(dfT, "w")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", round(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))),
        6))
      .groupBy("doc_id")
      .agg(sum(col("term_score").cast("decimal(38,6)")).cast("double").as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(topK)
  }

  /** DuckDB oracle: the same expression tree (identical literals and
    * parenthesization — float math is not associative). */
  def topDocsSql(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): String = {
    // SQL-escape embedded quotes so a term like "don't" can't break
    // (or silently change) the oracle query vs the Spark side's isin().
    val termList = terms.map(t => "'" + t.replace("'", "''") + "'").mkString(", ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), tf AS (
       |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
       |  FROM words GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM words GROUP BY 1
       |), stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE) /
       |           CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM dl
       |), dft AS (
       |  SELECT w, CAST(count(*) AS DOUBLE) AS df
       |  FROM (SELECT DISTINCT doc_id, w FROM words) t GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id,
       |         round(ln((s.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1) *
       |               tf.tf * ${k1 + 1} /
       |               (tf.tf + $k1 * (${1 - b} + $b * dl.dl / s.avgdl)),
       |               6) AS term_score
       |  FROM tf JOIN dl USING (doc_id) JOIN dft USING (w), stats s
       |  WHERE tf.w IN ($termList)
       |)
       |SELECT doc_id,
       |       CAST(SUM(CAST(term_score AS DECIMAL(38,6))) AS DOUBLE) AS score,
       |       CAST(count(*) AS BIGINT) AS n_terms_hit
       |FROM scored GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }
}
