package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via hashed n-gram importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling") — pick the raw-corpus documents whose
  * hashed unigram+bigram feature distribution looks most like a
  * TARGET corpus. The standard pretraining-mix curation step between
  * quality filtering and dedup.
  *
  * Mechanics, exactly the paper's bag-of-hashed-ngrams estimator:
  * features are unigrams + bigrams of whitespace tokens hashed into B
  * buckets; p̂ (target) and q̂ (raw) are add-one-smoothed bucket
  * distributions; a document's importance is
  * log w(x) = Σ_b c_b(x)·(ln p̂_b − ln q̂_b), and selection takes the
  * top-k by weight (the paper's Gumbel-noise resampling degenerates to
  * this deterministic top-k as temperature → 0; a seeded-hash Gumbel
  * variant drops in by adding an md5-derived term per doc).
  *
  * Oracle-exactness: the bucket hash is the shared md5→hex→int
  * currency; p̂/q̂ are ratios of exact longs through ONE IEEE divide
  * each; the two ln() calls match across engines (the Tfidf/LmScore
  * precedent) and the per-bucket log-ratio is quantized to integer
  * MICRO-units (round ·1e6 → long) before any per-document math — doc
  * weights are then pure LONG sums, order-immune and cross-engine
  * exact. (split/string_split of an empty text yields [""] on BOTH
  * engines, so even empty documents carry one near-neutral feature
  * row — mirrored identically.)
  *
  * Scale shape (the reason DSIR works at 10¹² docs): the corpus is
  * read once into a narrow gram explode; both distributions fold in
  * ONE B-bounded aggregate (B = a few thousand in production — the
  * model is bucket counts, never vocabulary); the B-row log-ratio
  * table broadcasts back; per-doc weights are one shuffle on doc_id;
  * selection is a distributed TakeOrdered top-k. Nothing driver-side,
  * no vocabulary materialization.
  */
object Dsir {

  /** Full per-doc importance-weight frame: (doc_id, w_micro), weight
    * in 1e-6 natural-log units. [[select]] and [[sample]] are top-k
    * policies over this.
    *
    * `fastHash = true` swaps the md5 bucket hash for codegen'd
    * xxhash64 — the production path (the Bootstrap fastHash
    * convention: md5 is the only cross-engine uniform, so the md5
    * variant stays the DuckDB-gated witness while this one carries
    * the deployed cost/exponent). Bucket marginals differ hash-to-hash
    * but the estimator's semantics are identical. */
  def weights(docs: DataFrame, targetPred: Column,
      buckets: Int = 256, fastHash: Boolean = false): DataFrame = {
    require(buckets > 0)
    val grams = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("_t", targetPred)
      .select(col("doc_id"), col("_t"),
        explode(concat(
          col("ws"),
          when(size(col("ws")) >= 2,
            expr("transform(sequence(1, size(ws) - 1), " +
              "i -> concat_ws(' ', slice(ws, i, 2)))"))
            .otherwise(array().cast("array<string>")))).as("gram"))
      .select(col("doc_id"), col("_t"),
        (if (fastHash) pmod(xxhash64(col("gram")), lit(buckets.toLong))
         else graft.functions.Md5PrefixLong(col("gram").cast("binary"), 6)
           % buckets).as("b"))
    // Collapse the gram stream to per-doc bucket counts FIRST: the
    // explode + md5 lineage (the expensive pass) then feeds exactly ONE
    // aggregation, and both the bucket marginals and the per-doc
    // weights derive from the ≤ docs×B count table. Σ_gram lw(b) ≡
    // Σ_(b) cnt·lw(b) in exact longs, so the result (and the DuckDB
    // oracle) is unchanged — this is purely the single-pass spelling of
    // the same estimator.
    val bcnt = grams.groupBy(col("doc_id"), col("_t"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val perBucket = bcnt.groupBy(col("b")).agg(
      sum(col("cnt")).as("s_cnt"),
      sum(when(col("_t"), col("cnt")).otherwise(0L)).as("t_cnt"))
    val totals = perBucket.agg(
      sum(col("s_cnt")).as("s_tot"), sum(col("t_cnt")).as("t_tot"))
    // B-row model table: quantized per-bucket log-ratio (micro-units)
    val lw = perBucket.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("t_cnt") + 1L).cast("double") /
                 (col("t_tot") + buckets.toLong).cast("double")) -
               log((col("s_cnt") + 1L).cast("double") /
                 (col("s_tot") + buckets.toLong).cast("double"))) * 1e6)
          .cast("long").as("lw"))
    bcnt.join(broadcast(lw), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("lw")).as("w_micro"))
  }

  /** Select the `k` raw docs with the highest hashed-ngram importance
    * weight toward the target slice (the paper's temperature-0 limit).
    *
    * @param targetPred boolean column marking the TARGET corpus rows
    * @return (doc_id, w_micro) — top-k by (weight, doc_id) */
  def select(docs: DataFrame, targetPred: Column, buckets: Int = 256,
      k: Int = 200): DataFrame = {
    require(k > 0)
    weights(docs, targetPred, buckets)
      .orderBy(col("w_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** The paper's actual sampler: draw k docs with probability
    * ∝ exp(log w / T) via the Gumbel-top-k trick — score = w/T + g,
    * g = −ln(−ln(u)) — with u a DETERMINISTIC md5-derived uniform per
    * (seed, doc), so the "random" draw is reproducible on any engine
    * with md5 (the Bootstrap/weightedSample currency). T → 0 recovers
    * [[select]]; larger T trades target-fit for diversity. Scores are
    * quantized to micro-units AFTER the float chain (two ln() calls,
    * mirrored op-for-op — the Tfidf precedent).
    *
    * @return (doc_id, score_micro) — top-k by (score, doc_id) */
  def sample(docs: DataFrame, targetPred: Column, buckets: Int = 256,
      k: Int = 200, temperature: Double = 1.0,
      seed: String = "dsir", fastHash: Boolean = false): DataFrame = {
    require(k > 0 && temperature > 0)
    val draw =
      if (fastHash)
        pmod(xxhash64(concat_ws(":", lit(seed), col("doc_id"))),
          lit(16777216L)).cast("double")
      else graft.functions.Md5PrefixLong(
          concat_ws(":", lit(seed), col("doc_id")).cast("binary"), 6)
        .cast("double")
    val u = (draw + 0.5) / 16777216.0
    weights(docs, targetPred, buckets, fastHash)
      .withColumn("score_micro",
        round((col("w_micro").cast("double") / 1e6 / temperature -
          log(-log(u))) * 1e6).cast("long"))
      .select(col("doc_id"), col("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Shared CTE chain producing the per-doc weight table `w`
    * (doc_id, w_micro) — the mirror of [[weights]]. */
  private def weightCtes(targetSql: String, buckets: Int,
      fastHash: Boolean = false): String = {
    // fast path: Spark's xxhash64(gram) spelled via DuckHash; pmod by a
    // power-of-two bucket count is the low-bit mask in the u64 domain
    val bExpr =
      if (fastHash) {
        require((buckets & (buckets - 1)) == 0,
          "fastHash bucket mask needs a power-of-two bucket count")
        s"CAST((${graft.util.DuckHash.xxhash64String("gram", "42::HUGEINT")})" +
          s" & ${buckets - 1}::HUGEINT AS BIGINT)"
      } else
        s"CAST(concat('0x', substring(md5(gram), 1, 6)) AS BIGINT) % $buckets"
    s"""ws AS (
       |  SELECT doc_id, ($targetSql) AS t, string_split(text, ' ') AS w
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, t, w[i] AS gram
       |  FROM ws, unnest(generate_series(1, len(w))) u(i)
       |  UNION ALL
       |  SELECT doc_id, t, array_to_string(w[i:i+1], ' ') AS gram
       |  FROM ws, unnest(generate_series(1, len(w) - 1)) u(i)
       |  WHERE len(w) >= 2),
       |bkt AS (
       |  SELECT doc_id, t, $bExpr AS b
       |  FROM grams),
       |bc AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS s_cnt,
       |    CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
       |  FROM bkt GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(s_cnt) AS BIGINT) AS s_tot,
       |    CAST(SUM(t_cnt) AS BIGINT) AS t_tot
       |  FROM bc),
       |lw AS (
       |  SELECT b,
       |    CAST(round((ln(CAST(t_cnt + 1 AS DOUBLE) / CAST(t_tot + $buckets AS DOUBLE))
       |        - ln(CAST(s_cnt + 1 AS DOUBLE) / CAST(s_tot + $buckets AS DOUBLE)))
       |      * 1000000.0) AS BIGINT) AS lw
       |  FROM bc, tot),
       |w AS (
       |  SELECT doc_id, CAST(SUM(lw) AS BIGINT) AS w_micro
       |  FROM bkt JOIN lw USING (b) GROUP BY 1)""".stripMargin
  }

  /** DuckDB mirror of [[select]] over the `documents` table with
    * `targetSql` as the target predicate. */
  def selectSql(targetSql: String, buckets: Int = 256,
      k: Int = 200): String =
    s"""WITH ${weightCtes(targetSql, buckets)}
       |SELECT doc_id, w_micro FROM w
       |ORDER BY w_micro DESC, doc_id LIMIT $k""".stripMargin

  /** DuckDB mirror of [[sample]] (`fastHash` mirrors the xxhash64
    * buckets + Gumbel draw via graft.util.DuckHash — the draw's pmod
    * by 2^24 is the low-bit mask in the u64 domain). */
  def sampleSql(targetSql: String, buckets: Int = 256, k: Int = 200,
      temperature: Double = 1.0, seed: String = "dsir",
      fastHash: Boolean = false): String = {
    val drawSql =
      if (fastHash)
        s"CAST((${graft.util.DuckHash.xxhash64String("ds", "42::HUGEINT")})" +
          " & 16777215::HUGEINT AS BIGINT)"
      else
        s"""CAST(concat('0x',
           |          substring(md5(concat('$seed', ':', doc_id)), 1, 6))
           |          AS BIGINT)""".stripMargin
    s"""WITH ${weightCtes(targetSql, buckets, fastHash)},
       |wd AS (
       |  SELECT doc_id, w_micro, concat('$seed', ':', doc_id) AS ds FROM w),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(round((CAST(w_micro AS DOUBLE) / 1000000.0 / $temperature
       |      - ln(-ln((CAST($drawSql AS DOUBLE) + 0.5) / 16777216.0)))
       |      * 1000000.0) AS BIGINT) AS score_micro
       |  FROM wd)
       |SELECT doc_id, score_micro FROM sc
       |ORDER BY score_micro DESC, doc_id LIMIT $k""".stripMargin
  }
}
