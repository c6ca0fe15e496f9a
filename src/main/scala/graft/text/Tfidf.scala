package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF top terms per document — the classic featurization /
  * keyword-extraction operator of a text pipeline (the per-document
  * dual of [[Bm25]]'s per-query retrieval).
  *
  * Plan shape at 100 TB: ONE token-explode scan feeds both term
  * frequencies and document frequencies; the document count rides
  * along as a 1-row broadcast; the final top-k per doc is a window
  * row_number over the scored table partitioned by doc (each doc's
  * terms sort locally — nothing global). Scores are 6-dp-rounded so
  * the ordering (and the DuckDB oracle) is bit-stable; idf uses the
  * plain ln(N/df) form. Ties broken by term text.
  */
object Tfidf {

  /** Top-`k` terms per doc by tf·idf. Output: (doc_id, term, score, rk). */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfT = words.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfT, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "score", "rk")
  }

  /** DuckDB oracle: identical expression tree and tiebreaks. */
  def topTermsSql(k: Int = 3): String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM words GROUP BY 1, 2
       |), dft AS (
       |  SELECT term, CAST(count(*) AS DOUBLE) AS df
       |  FROM (SELECT DISTINCT doc_id, term FROM words) t GROUP BY 1
       |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |         round(tf.tf * ln(n.n_docs / dft.df), 6) AS score
       |  FROM tf JOIN dft USING (term), n
       |)
       |SELECT doc_id, term, score,
       |       CAST(row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, term) AS INT) AS rk
       |FROM scored
       |QUALIFY rk <= $k""".stripMargin

  /** Feature hashing (the hashing-trick vectorizer): every word maps
    * to `dim` buckets by hash, per-doc bucket counts are the feature
    * vector — the fixed-width featurization that needs NO vocabulary
    * build (the property that matters at 100 TB: no global dictionary
    * job, no OOV problem, new data streams through statelessly).
    * Emitted in sparse long form (doc_id, bucket, n) — exactly what a
    * downstream trainer ingests, and exactly SQL-expressible, so the
    * gate is oracle-exact. The hash is the cross-engine md5-60 (mod
    * dim); one token scan, one (doc, bucket) shuffle. */
  def featureHash(docs: DataFrame, dim: Int = 64): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        pmod(graft.functions.Md5PrefixLong(col("w").cast("binary"), 15),
          lit(dim.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("n"))

  def featureHashSql(dim: Int = 64): String =
    s"""SELECT doc_id,
       |  CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % $dim AS bucket,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents) t
       |GROUP BY 1, 2""".stripMargin

  /** Unigram (word-frequency) entropy per document — the
    * perplexity-proxy quality signal: low entropy flags repetitive /
    * boilerplate text, high entropy flags word salad. H = -Σ p·ln p
    * over the doc's word distribution.
    *
    * Scale shape: entropy is a PER-ROW property (the distribution
    * lives inside one document), so this is a narrow typed kernel —
    * zero shuffles, one scan, trivially 100 TB-parallel — instead of
    * the token-explode + (doc, word) groupBy a first draft would
    * shuffle. Per-term contributions are 6-dp-rounded and summed as
    * BigDecimal; decimal addition is associative AND commutative, so
    * the in-doc summation order is immaterial and the DuckDB oracle
    * (explode + DECIMAL(38,6) sum) reproduces the double bit-for-bit.
    * Rounding matches Spark's round(): HALF_UP on the BigDecimal. */
  def unigramEntropy(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    TextAnalysis.balanced(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val words = text.split(" ", -1)
        val n = words.length.toDouble
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i < words.length) {
          counts.merge(words(i), 1, Integer.sum _); i += 1
        }
        var acc = java.math.BigDecimal.ZERO
        val it = counts.values().iterator()
        while (it.hasNext) {
          val p = it.next().toDouble / n
          // identical expression tree to `-(c/n) * ln(c/n)`: IEEE
          // sign-flip of a product is exact, so -(p·ln p) ≡ (-p)·ln p
          val term = -(p * math.log(p))
          acc = acc.add(java.math.BigDecimal.valueOf(term)
            .setScale(6, java.math.RoundingMode.HALF_UP))
        }
        (id, acc.doubleValue(), counts.size().toLong)
      })
      .toDF("doc_id", "entropy", "n_distinct_words")
  }

  val unigramEntropySql: String =
    """WITH counts AS (
      |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS c, max(n) AS n
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |          CAST(len(string_split(text, ' ')) AS DOUBLE) AS n
      |        FROM documents) t
      |  GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(SUM(CAST(round(-(c / n) * ln(c / n), 6) AS DECIMAL(38,6)))
      |       AS DOUBLE) AS entropy,
      |  CAST(count(*) AS BIGINT) AS n_distinct_words
      |FROM counts GROUP BY 1""".stripMargin
}
