package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — the CCNet-style perplexity filter:
  * score every TEST document by a smoothed bigram model fit on the
  * TRAIN split, so out-of-distribution text (wrong language, spam,
  * boilerplate) surfaces as low average log-probability and can be
  * thresholded out of the corpus.
  *
  * Model: add-α smoothing, P(w2|w1) = (C(w1 w2) + α) / (C(w1) + α·V)
  * with V = train unigram vocabulary size. Plan shape at 100 TB: the
  * train pass builds two count tables (one shuffle each, partial
  * aggregation on the map side); the test pass explodes bigrams once
  * and LEFT-joins the count tables on the bigram/unigram key (unseen
  * n-grams coalesce to 0 and fall back to the smoothing floor — no
  * row loss); V rides along as a 1-row broadcast. Per-position terms
  * are 6-dp-rounded and decimal-summed, so the document score is
  * independent of aggregation order and the DuckDB oracle matches
  * bit-for-bit.
  */
object LmScore {

  /** Per-test-doc smoothed bigram log-prob stats:
    * (doc_id, n_bigrams, sum_logprob, avg_logprob). Split follows
    * [[CorpusPipeline.trainTestSplit]] (hash-based, leakage-free). */
  def bigramLogProb(docs: DataFrame, trainFrac: Double = 0.9,
      alpha: Double = 0.5): DataFrame = {
    // the split is a pure hash column — no docs⋈split self-join
    val withSplit = docs.withColumn("split",
      CorpusPipeline.splitExpr(trainFrac))
    def bigrams(df: DataFrame): DataFrame = df
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val train = withSplit.filter(col("split") === "train")
    val test = withSplit.filter(col("split") === "test")
    val c2 = bigrams(train).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c2"))
    // vocab-bounded, referenced by the vocab-size scalar AND the
    // scoring join — pinned so the train unigram pass runs once
    // (scan census: 4 → 3 corpus scans; train bigrams, train
    // unigrams, and test bigrams are distinct kernels by need)
    val c1 = train
      .select(explode(split(col("text"), " ")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
      .localCheckpoint(true)
    val v = c1.agg(count(lit(1)).cast("double").as("vocab"))
    bigrams(test)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("term", round(
        log((coalesce(col("c2"), lit(0L)).cast("double") + alpha) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha) * col("vocab"))),
        6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("term").cast("decimal(38,6)")).cast("double").as("sum_logprob"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_logprob"),
        (col("sum_logprob") / col("n_bigrams").cast("double")).as("avg_logprob"))
  }

  /** DuckDB oracle: identical split, counts, smoothing, and rounding. */
  def bigramLogProbSql(trainFrac: Double = 0.9, alpha: Double = 0.5): String =
    s"""WITH split AS (${CorpusPipeline.trainTestSplitSql(trainFrac)}),
       |docs2 AS (SELECT d.doc_id, d.text, s.split,
       |                 string_split(d.text, ' ') AS ws
       |          FROM documents d JOIN split s USING (doc_id)),
       |train_bg AS (
       |  SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2,
       |         CAST(count(*) AS BIGINT) AS c2
       |  FROM docs2, unnest(generate_series(1, len(ws) - 1)) t(i)
       |  WHERE split = 'train' AND len(ws) >= 2
       |  GROUP BY 1, 2),
       |train_ug AS (
       |  SELECT unnest(ws) AS w1 FROM docs2 WHERE split = 'train'),
       |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
       |       FROM train_ug GROUP BY 1),
       |v AS (SELECT CAST(count(*) AS DOUBLE) AS vocab FROM c1),
       |test_bg AS (
       |  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       |  FROM docs2, unnest(generate_series(1, len(ws) - 1)) t(i)
       |  WHERE split = 'test' AND len(ws) >= 2),
       |terms AS (
       |  SELECT t.doc_id,
       |    round(ln((CAST(COALESCE(bg.c2, 0) AS DOUBLE) + $alpha) /
       |             (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + $alpha * v.vocab)),
       |          6) AS term
       |  FROM test_bg t
       |  LEFT JOIN train_bg bg ON t.w1 = bg.w1 AND t.w2 = bg.w2
       |  LEFT JOIN c1 ON t.w1 = c1.w1
       |  CROSS JOIN v)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS sum_logprob,
       |  CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS avg_logprob
       |FROM terms GROUP BY 1""".stripMargin
}
