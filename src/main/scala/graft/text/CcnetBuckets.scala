package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al. 2020, §4.3): fit a
  * language model on a trusted split, score EVERY document, and cut
  * the corpus into head / middle / tail terciles by model score — the
  * head tercile is what CCNet keeps for LM pretraining, the tail is
  * boilerplate/spam. Composes the [[LmScore]] bigram model (train
  * split = the trusted side of the hash split) with a deterministic
  * NTILE(3) cut and a per-(lang, bucket) rollup.
  *
  * Plan shape at 100 TB: the train pass is the two bounded count
  * tables; scoring is one bigram explode + LEFT joins (the LmScore
  * shape, over the FULL corpus instead of the test split); the
  * tercile cut rides [[graft.ops.GlobalRank]]'s bucketed distributed
  * rank (NO single-partition global window — the doc-score frame is
  * corpus-sized at real scale), with NTILE(3) recovered from the rank
  * by exact integer arithmetic `(rn−1)·3 div N + 1` (identical to SQL
  * NTILE: remainder buckets come first); the rollup collapses to
  * ≤ 3·|langs| rows. Scores are 6-dp-rounded decimal sums →
  * cross-engine exact, so bucket boundaries (and the hash) are too.
  */
object CcnetBuckets {

  /** Per-(lang, bucket) rollup: (lang, bucket, n_docs, sum_words,
    * min_avg_logprob, max_avg_logprob). Bucket 1 = head (best scores),
    * 3 = tail; ties broken by doc_id so the cut is total. */
  def buckets(docs: DataFrame, trainFrac: Double = 0.9,
      alpha: Double = 0.5): DataFrame = {
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
    val c2 = bigrams(train).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode(split(col("text"), " ")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = c1.agg(count(lit(1)).cast("double").as("vocab"))
    // score EVERY doc (CCNet scores the whole crawl, not a held-out set)
    val scored = bigrams(withSplit)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("term", round(
        log((coalesce(col("c2"), lit(0L)).cast("double") + alpha) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha) * col("vocab"))),
        6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("term").cast("decimal(38,6)")).cast("double").as("sum_lp"))
      .withColumn("avg_lp", col("sum_lp") / col("n_bigrams").cast("double"))
      // one row per doc, 4 columns — bounded. GlobalRank references its
      // input three times (stats, bucketing, offsets) and the tercile
      // cut counts it a fourth; without this the bigram explode + model
      // joins above re-execute per reference (SemDedup precedent).
      .localCheckpoint(true)
    // distributed rank by (avg_lp desc, doc_id): negate for GlobalRank's
    // ascending order; NTILE(3) = (rn-1)*3 div N + 1, all-integer.
    val ranked = graft.ops.GlobalRank.withGlobalRank(
      scored.withColumn("neg_lp", -col("avg_lp")), "neg_lp", "doc_id", "rn",
      materialize = false) // scored is already checkpointed above
    val total = scored.agg(count(lit(1)).as("n_total"))
    val cut = ranked.crossJoin(broadcast(total))
      .withColumn("bucket",
        expr("CAST((rn - 1) * 3 div n_total AS INT) + 1"))
    cut.join(docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words")), "doc_id")
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("sum_words"),
        min(col("avg_lp")).as("min_avg_logprob"),
        max(col("avg_lp")).as("max_avg_logprob"))
  }

  /** DuckDB mirror: identical model, scoring, tercile cut, rollup. */
  def bucketsSql(trainFrac: Double = 0.9, alpha: Double = 0.5): String =
    s"""WITH split AS (${CorpusPipeline.trainTestSplitSql(trainFrac)}),
       |docs2 AS (SELECT d.doc_id, d.lang, s.split,
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
       |all_bg AS (
       |  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       |  FROM docs2, unnest(generate_series(1, len(ws) - 1)) t(i)
       |  WHERE len(ws) >= 2),
       |terms AS (
       |  SELECT t.doc_id,
       |    round(ln((CAST(COALESCE(bg.c2, 0) AS DOUBLE) + $alpha) /
       |             (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + $alpha * v.vocab)),
       |          6) AS term
       |  FROM all_bg t
       |  LEFT JOIN train_bg bg ON t.w1 = bg.w1 AND t.w2 = bg.w2
       |  LEFT JOIN c1 ON t.w1 = c1.w1
       |  CROSS JOIN v),
       |scored AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) /
       |      CAST(count(*) AS DOUBLE) AS avg_lp
       |  FROM terms GROUP BY 1),
       |ranked AS (
       |  SELECT doc_id, avg_lp,
       |    row_number() OVER (ORDER BY avg_lp DESC, doc_id) AS rn,
       |    (SELECT count(*) FROM scored) AS n_total
       |  FROM scored),
       |cut AS (
       |  SELECT doc_id, avg_lp,
       |    CAST((rn - 1) * 3 // n_total AS INT) + 1 AS bucket
       |  FROM ranked)
       |SELECT d.lang, c.bucket, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS sum_words,
       |  MIN(c.avg_lp) AS min_avg_logprob,
       |  MAX(c.avg_lp) AS max_avg_logprob
       |FROM cut c JOIN documents d USING (doc_id)
       |GROUP BY 1, 2""".stripMargin
}
