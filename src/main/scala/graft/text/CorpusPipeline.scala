package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus filter — the composition the engine
  * exists for: quality gate → near-dup clustering → keep one canonical
  * doc per cluster → token accounting for the surviving corpus.
  *
  * Everything is declarative DataFrame composition, so Catalyst fuses
  * the quality projection into the scan, the dedup side runs its own
  * bounded-iteration component pass, and the final keep is a
  * semi-join + anti-join on doc_id (both shuffle only ids, never
  * text). At 100 TB: the heavy text columns are touched exactly twice
  * (quality scan, shingle scan); survivors are selected by id joins.
  */
object CorpusPipeline {

  /** @return one row per surviving doc: (doc_id, lang, n_tokens,
    *         n_chars) — quality-"ok" docs minus non-canonical
    *         near-duplicates at `threshold`. */
  def filteredCorpus(docs: DataFrame, threshold: Double,
      maxShingleDF: Long = 0L): DataFrame = {
    val ok = TextAnalysis.qualityScore(docs)
      .filter(col("quality_bucket") === "ok").select("doc_id")
    val nonCanonical = DedupClusters.fromDocuments(docs, threshold, maxShingleDF)
      .filter(!col("is_canonical")).select("doc_id")
    docs
      .join(ok, Seq("doc_id"), "left_semi")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).as("n_tokens"),
        length(col("text")).as("n_chars"))
  }

  /** DuckDB mirror: quality subquery + recursive-CTE clusters, NOT IN
    * for the anti-join. */
  def filteredCorpusSql(threshold: Double, maxShingleDF: Long = 0L): String = {
    s"""${DedupClusters.labCtes(threshold, maxShingleDF)},
       |quality_ok AS (
       |  SELECT doc_id FROM (${TextAnalysis.qualityScoreSql}) q
       |  WHERE q.quality_bucket = 'ok'),
       |non_canonical AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
       |SELECT d.doc_id, d.lang,
       |  CAST(len(regexp_extract_all(d.text, '\\S+')) AS INT) AS n_tokens,
       |  CAST(length(d.text) AS INT) AS n_chars
       |FROM documents d
       |JOIN quality_ok USING (doc_id)
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM non_canonical)""".stripMargin
  }

  /** The capstone composition — a full training-data build in ONE
    * lazy plan: quality gate ∧ langid-confidence gate (predicted lang
    * must agree with the recorded label — the C4-style "langid says
    * what the source claims" filter) ∧ near-dup removal (keep
    * canonical per cluster), then the deterministic hash split, rolled
    * up to per-(lang, split) doc and token counts — the dashboard a
    * data-build run actually publishes. Every stage is an
    * independently-gated operator; this gate proves they COMPOSE in
    * one plan without materialization barriers: three semi/anti joins
    * on doc_id feed a single aggregate — Catalyst sees the whole
    * lineage, all counts stay BIGINT. */
  def e2eBuild(docs: DataFrame, threshold: Double,
      maxShingleDF: Long = 0L, trainFrac: Double = 0.9): DataFrame = {
    val ok = TextAnalysis.qualityScore(docs)
      .filter(col("quality_bucket") === "ok").select("doc_id")
    val langOk = TextAnalysis.langId(docs)
      .filter(col("predicted_lang") === col("labeled_lang")).select("doc_id")
    val nonCanonical = DedupClusters.fromDocuments(docs, threshold, maxShingleDF)
      .filter(!col("is_canonical")).select("doc_id")
    docs
      .join(ok, Seq("doc_id"), "left_semi")
      .join(langOk, Seq("doc_id"), "left_semi")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .select(col("lang"), splitExpr(trainFrac).as("split"),
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).cast("long")
          .as("_tok"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("n_tokens"))
  }

  /** DuckDB mirror of [[e2eBuild]]: the filtered-corpus CTE chain plus
    * the langid-confidence gate and the split case expression. */
  def e2eBuildSql(threshold: Double, maxShingleDF: Long = 0L,
      trainFrac: Double = 0.9): String =
    s"""${DedupClusters.labCtes(threshold, maxShingleDF)},
       |quality_ok AS (
       |  SELECT doc_id FROM (${TextAnalysis.qualityScoreSql}) q
       |  WHERE q.quality_bucket = 'ok'),
       |lang_ok AS (
       |  SELECT doc_id FROM (${TextAnalysis.langIdSql}) l
       |  WHERE l.predicted_lang = l.labeled_lang),
       |non_canonical AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
       |SELECT d.lang,
       |  CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
       |            AS BIGINT) < ${splitThreshold(trainFrac)}
       |       THEN 'train' ELSE 'test' END AS split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT))
       |    AS BIGINT) AS n_tokens
       |FROM documents d
       |JOIN quality_ok USING (doc_id)
       |JOIN lang_ok USING (doc_id)
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM non_canonical)
       |GROUP BY 1, 2""".stripMargin

  /** Length-bucketed batching audit: bucket docs by token count and
    * account the padding waste of batching each bucket to its own max
    * length — the pre-flight metric behind length bucketing (uniform
    * batching pads EVERY doc to the global max; per-bucket padding
    * shrinks the wasted FLOPs to the intra-bucket spread). One
    * corpus scan + one bucket-keyed aggregate; waste stays all-BIGINT
    * until the final share division, so the oracle is bit-exact. */
  def lengthBuckets(docs: DataFrame, bucketTokens: Long = 64L): DataFrame = {
    require(bucketTokens > 0)
    val nTok = size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).cast("long")
    docs.select(nTok.as("n_tokens"))
      .withColumn("bucket_start",
        (col("n_tokens") - pmod(col("n_tokens"), lit(bucketTokens))))
      .groupBy(col("bucket_start"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .select(col("bucket_start"), col("n_docs"), col("sum_tokens"),
        col("max_tokens"),
        (col("n_docs") * col("max_tokens") - col("sum_tokens"))
          .as("padding_waste"),
        when(col("n_docs") * col("max_tokens") === 0L, lit(0.0))
          .otherwise(
            (col("n_docs") * col("max_tokens") - col("sum_tokens"))
              .cast("double")
              / (col("n_docs") * col("max_tokens")).cast("double"))
          .as("waste_share"))
  }

  def lengthBucketsSql(bucketTokens: Long = 64L): String =
    s"""WITH t AS (
       |  SELECT CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT n_tokens - (n_tokens % $bucketTokens) AS bucket_start, n_tokens
       |  FROM t)
       |SELECT bucket_start,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding_waste,
       |  CASE WHEN count(*) * max(n_tokens) = 0 THEN 0.0
       |    ELSE CAST(count(*) * max(n_tokens) - sum(n_tokens) AS DOUBLE)
       |      / CAST(count(*) * max(n_tokens) AS DOUBLE) END AS waste_share
       |FROM b GROUP BY 1""".stripMargin

  private val Pow60 = 1152921504606846976L // 2^60

  private def splitThreshold(trainFrac: Double): Long =
    (trainFrac * Pow60).toLong

  /** The split assignment as a pure column over doc_id — usable inline
    * (no self-join) by any operator that needs the split axis. */
  private[text] def splitExpr(trainFrac: Double): org.apache.spark.sql.Column =
    when(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast("long") < splitThreshold(trainFrac), "train")
      .otherwise("test")

  /** Deterministic, leakage-free document-level train/test split: the
    * md5-60 hash of the doc id maps to a uniform 60-bit value; ids
    * below `trainFrac`·2⁶⁰ are train. Hash-based (not row_number or
    * rand()) so the assignment is stable under repartitioning, joins,
    * and incremental corpus growth — the property a 100 TB pipeline
    * needs so yesterday's test docs never drift into today's train
    * set. Pure column expressions, no shuffle. */
  def trainTestSplit(docs: DataFrame, trainFrac: Double = 0.9): DataFrame =
    docs.select(col("doc_id"), splitExpr(trainFrac).as("split"))

  def trainTestSplitSql(trainFrac: Double = 0.9): String =
    s"""SELECT doc_id,
       |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
       |            AS BIGINT) < ${splitThreshold(trainFrac)}
       |       THEN 'train' ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Domain (language) mixing — the C4/Pile-style rebalance step:
    * downsample each language to ≈ `targetPerLang` docs by
    * deterministic hash acceptance (keep doc iff hash(doc_id) <
    * target/actual · 2⁶⁰). Selection is per-doc and hash-based, so it
    * is stable under repartitioning and incremental growth, needs no
    * global sort or limit, and composes with the train/test split
    * (both read the same uniform hash axis... deliberately the same
    * function, so mixing before or after splitting keeps both
    * properties). Counts land within binomial noise of the target —
    * the standard practice at corpus scale, where exact-N sampling
    * would need a global sort. */
  def domainMix(docs: DataFrame, targetPerLang: Long = 60L): DataFrame = {
    val rates = docs.groupBy("lang").agg(count(lit(1)).as("actual"))
      .select(col("lang"),
        floor(least(lit(1.0), lit(targetPerLang.toDouble) / col("actual")) *
          lit(Pow60.toDouble)).as("cut"))
    docs.join(broadcast(rates), "lang")
      .filter(conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 15), 16, 10).cast("long") < col("cut"))
      .select(col("doc_id"), col("lang"))
  }

  def domainMixSql(targetPerLang: Long = 60L): String =
    s"""WITH counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS actual
       |  FROM documents GROUP BY 1),
       |rates AS (
       |  SELECT lang,
       |    CAST(FLOOR(least(1.0, ${targetPerLang.toDouble} / actual) *
       |               ${Pow60.toDouble}) AS BIGINT) AS cut
       |  FROM counts)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN rates r USING (lang)
       |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
       |           AS BIGINT) < r.cut""".stripMargin

  /** Sequence packing — the pretraining batch-prep step: documents are
    * concatenated in a deterministic order and split into fixed
    * token-budget chunks, so each doc gets a byte/token OFFSET and the
    * CHUNK its first token lands in (concat-then-chunk, the GPT-style
    * packing that wastes no padding). Packing is sharded by language
    * (each shard is an independent stream), so the running-total
    * window parallelizes across shards — the realistic sharded form;
    * a global single stream would serialize, which is exactly why
    * real pipelines pack per shard. */
  def packSequences(docs: DataFrame, chunkTokens: Long = 256L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("offset",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("chunk_id", (col("offset") / chunkTokens).cast("long"))
      .select("doc_id", "lang", "n_tokens", "offset", "chunk_id")
  }

  /** Next-fit WHOLE-doc packing — the instruction-tuning counterpart
    * of [[packSequences]]: documents are never split; the running bin
    * closes when the next doc would overflow the token budget (an
    * oversize doc owns a bin by itself). Bin assignment is inherently
    * sequential per shard, so it runs as an O(1)-state sorted
    * mapPartitions kernel with each lang co-located by a repartition
    * — the Funnel pattern, skew-safe by construction (state never
    * grows with history). The oracle is a DuckDB recursive CTE
    * walking the same (lang, doc_id) order: the imperative kernel and
    * the declarative recursion must agree bin-for-bin. */
  def packWholeDocs(docs: DataFrame, budgetTokens: Long = 256L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        var lang: String = null
        var used = 0L
        var bin = 0L
        it.map { case (id, lg, n) =>
          if (lg != lang) { lang = lg; bin = 1L; used = 0L }
          if (used > 0 && used + n > budgetTokens) { bin += 1; used = 0L }
          val off = used
          used += n
          (id, lg, n, bin, off)
        }
      }
      .toDF("doc_id", "lang", "n_tokens", "bin_id", "offset_in_bin")
  }

  /** DuckDB oracle for [[packWholeDocs]]: recursive next-fit walk. */
  def packWholeDocsSql(budgetTokens: Long = 256L): String =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
       |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
       |  FROM documents),
       |pack AS (
       |  SELECT doc_id, lang, n, rn,
       |    CAST(1 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS off, n AS used
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.doc_id, t.lang, t.n, t.rn,
       |    CASE WHEN p.used + t.n <= $budgetTokens
       |         THEN p.bin_id ELSE p.bin_id + 1 END,
       |    CASE WHEN p.used + t.n <= $budgetTokens
       |         THEN p.used ELSE CAST(0 AS BIGINT) END,
       |    CASE WHEN p.used + t.n <= $budgetTokens
       |         THEN p.used + t.n ELSE t.n END
       |  FROM t JOIN pack p ON t.lang = p.lang AND t.rn = p.rn + 1)
       |SELECT doc_id, lang, n AS n_tokens, bin_id,
       |  off AS offset_in_bin
       |FROM pack""".stripMargin

  def packSequencesSql(chunkTokens: Long = 256L): String =
    s"""SELECT doc_id, lang, n_tokens,
       |  CAST(COALESCE(SUM(n_tokens) OVER w - n_tokens, 0) AS BIGINT) AS offset,
       |  CAST(FLOOR(COALESCE(SUM(n_tokens) OVER w - n_tokens, 0) /
       |             $chunkTokens.0) AS BIGINT) AS chunk_id
       |FROM (SELECT doc_id, lang,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |      FROM documents) t
       |WINDOW w AS (PARTITION BY lang ORDER BY doc_id)""".stripMargin

  /** Temperature-scaled domain mixing (the multilingual-pretraining
    * rebalance, α = 0.5): sampling weight per source ∝ √n instead of n,
    * so small domains are up-weighted relative to their share without
    * exceeding rate 1 (no upsampling). Acceptance is the same
    * deterministic hash axis as [[domainMix]]/[[trainTestSplit]], so
    * the selection is stable under repartitioning and growth.
    * Exactness notes: √ is IEEE-correctly-rounded in both engines
    * (unlike pow), weights are 6-dp-rounded and decimal-summed so the
    * normalizer is independent of aggregation order. */
  def temperatureMix(docs: DataFrame, targetTotal: Long = 300L): DataFrame = {
    val weights = docs.groupBy("source").agg(count(lit(1)).as("actual"))
      .withColumn("w", round(sqrt(col("actual").cast("double")), 6))
    val tot = weights.agg(
      sum(col("w").cast("decimal(38,6)")).cast("double").as("w_sum"))
    val rates = weights.crossJoin(broadcast(tot))
      .select(col("source"),
        floor(least(lit(1.0),
          lit(targetTotal.toDouble) * col("w") /
            (col("w_sum") * col("actual").cast("double"))) *
          lit(Pow60.toDouble)).as("cut"))
    docs.join(broadcast(rates), "source")
      .filter(conv(substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 15), 16, 10).cast("long") < col("cut"))
      .select(col("doc_id"), col("source"), col("lang"))
  }

  def temperatureMixSql(targetTotal: Long = 300L): String =
    s"""WITH counts AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS actual
       |  FROM documents GROUP BY 1),
       |weights AS (
       |  SELECT source, actual,
       |         round(sqrt(CAST(actual AS DOUBLE)), 6) AS w
       |  FROM counts),
       |tot AS (
       |  SELECT CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS w_sum
       |  FROM weights),
       |rates AS (
       |  SELECT source,
       |    CAST(FLOOR(least(1.0, ${targetTotal.toDouble} * w /
       |                          (w_sum * CAST(actual AS DOUBLE))) *
       |               ${Pow60.toDouble}) AS BIGINT) AS cut
       |  FROM weights, tot)
       |SELECT d.doc_id, d.source, d.lang
       |FROM documents d JOIN rates r USING (source)
       |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
       |           AS BIGINT) < r.cut""".stripMargin

  /** Token-budget corpus selection: per language, take the
    * highest-quality documents (alpha-ratio desc, doc_id tiebreak)
    * until the cumulative token count reaches `budgetPerLang` — the
    * "best N tokens per domain" selection every pretraining mix ends
    * with. One window over each language shard; shards run in
    * parallel and nothing is cross-language.
    *
    * Scale honesty: a window PARTITION is one task, so with few huge
    * languages the per-shard prefix sum serializes. The fleet-scale
    * recipe keeps the same semantics in two passes: approximate the
    * per-language quality threshold from a sample (the score whose
    * cumulative tokens ≈ budget), hash-filter above it in parallel,
    * and run this exact window only on the thin boundary band. This
    * operator IS that exact final pass; the gate proves its
    * semantics. */
  def tokenBudgetSelect(docs: DataFrame, budgetPerLang: Long = 3000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("alpha_ratio").desc, col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double")).as("alpha_ratio"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerLang)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
  }

  def tokenBudgetSelectSql(budgetPerLang: Long = 3000L): String =
    s"""SELECT doc_id, lang, n_tokens,
       |  CAST(SUM(n_tokens) OVER win AS BIGINT) AS cum_tokens
       |FROM (SELECT doc_id, lang,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE) AS alpha_ratio
       |      FROM documents) t
       |WINDOW win AS (PARTITION BY lang ORDER BY alpha_ratio DESC, doc_id)
       |QUALIFY CAST(SUM(n_tokens) OVER win AS BIGINT) <= $budgetPerLang""".stripMargin

  /** Stratified train/test split: the [[trainTestSplit]] hash axis
    * SALTED WITH THE STRATUM, so each language independently lands
    * within binomial noise of `trainFrac` — a global hash split can
    * starve a small stratum; the salted one can't. Still pure column
    * expressions: stable under repartitioning and growth. */
  def stratifiedSplit(docs: DataFrame, trainFrac: Double = 0.8): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      when(conv(substring(md5(concat(col("lang"), lit(":"),
        col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10)
        .cast("long") < splitThreshold(trainFrac), "train")
        .otherwise("test").as("split"))

  def stratifiedSplitSql(trainFrac: Double = 0.8): String =
    s"""SELECT doc_id, lang,
       |  CASE WHEN CAST('0x' || substr(md5(lang || ':' ||
       |                 CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
       |            < ${splitThreshold(trainFrac)}
       |       THEN 'train' ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Deterministic EXACT-K per-stratum sample (min-wise / bottom-k
    * sampling): keep the `k` docs with the smallest md5 rank inside
    * each key — the cap-not-rate companion to [[stratifiedSplit]]
    * (a fraction split can't promise "at most k per language"; this
    * can, with the same rerun/partitioning stability, and bottom-k
    * sets MERGE across shards by re-taking the k smallest, so a
    * 1000-shard corpus samples in one tree-reduce). Tie-free order
    * (md5, doc_id); the per-key window is bounded by the stratum. */
  def bottomKPerKey(docs: DataFrame, keyCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    docs.select(col(idCol), col(keyCol))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  def bottomKPerKeySql(keyCol: String, idCol: String, k: Int): String =
    s"""SELECT $idCol, $keyCol, sample_rank FROM (
       |  SELECT $idCol, $keyCol,
       |    CAST(row_number() OVER (PARTITION BY $keyCol
       |      ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS INT)
       |      AS sample_rank
       |  FROM documents) t
       |WHERE sample_rank <= $k""".stripMargin

  /** Curriculum staging: ntile-bucket documents into `stages` learning
    * stages per language, best quality (alpha ratio) first — the
    * "clean data early, noisy data late" ordering curriculum training
    * consumes. Pure window over each language shard; the tie-free
    * (alpha_ratio, doc_id) order makes the staging deterministic.
    * Same per-shard-window scale note as [[tokenBudgetSelect]]: at
    * fleet scale, stage boundaries come from sampled quality
    * quantiles (approx_percentile per language — parallel), with the
    * exact ntile reserved for boundary reconciliation. */
  def curriculumStages(docs: DataFrame, stages: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("alpha_ratio").desc, col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        (length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double")).as("alpha_ratio"))
      .withColumn("stage", ntile(stages).over(w))
      .select("doc_id", "lang", "alpha_ratio", "stage")
  }

  def curriculumStagesSql(stages: Int = 4): String =
    s"""SELECT doc_id, lang, alpha_ratio,
       |  CAST(ntile($stages) OVER (PARTITION BY lang
       |       ORDER BY alpha_ratio DESC, doc_id) AS INT) AS stage
       |FROM (SELECT doc_id, lang,
       |        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE) AS alpha_ratio
       |      FROM documents) t""".stripMargin

  /** Deterministic epoch shuffle + sharding: the reproducible "global
    * shuffle" every pretraining run needs per epoch. A seeded content
    * hash (epoch salted into the md5-60 axis) gives each doc a
    * pseudo-random sort key — different epochs permute differently,
    * the same epoch replays identically on any cluster size — and the
    * shard assignment + in-shard position fall out of the same hash.
    * No global sort: each shard orders independently (one shuffle on
    * the shard key), which is exactly how shard files are written. */
  def epochShuffle(docs: DataFrame, epoch: Int, shards: Int = 8): DataFrame = {
    val h = conv(substring(md5(concat(lit(s"$epoch:"),
      col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos_in_shard")
  }

  def epochShuffleSql(epoch: Int, shards: Int = 8): String =
    s"""SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
       |       AS BIGINT) AS pos_in_shard
       |FROM (SELECT doc_id,
       |        CAST('0x' || substr(md5('$epoch:' || CAST(doc_id AS VARCHAR)),
       |             1, 15) AS BIGINT) AS h,
       |        CAST('0x' || substr(md5('$epoch:' || CAST(doc_id AS VARCHAR)),
       |             1, 15) AS BIGINT) % $shards AS shard
       |      FROM documents) t""".stripMargin

  /** Benchmark-contamination check (the GPT-3/C4-style n-gram overlap
    * audit): for every TEST document, the fraction of its distinct
    * word `n`-grams that also occur anywhere in the TRAIN split.
    * Grams are md5-hashed, so the join currency is 16 bytes regardless
    * of text width; the train side is a DISTINCT gram set (bounded by
    * corpus vocabulary, shuffled once); the test side joins on the
    * gram hash — at 100 TB this is one hash-join between two
    * gram-hash tables, never a doc×doc comparison. */
  def contamination(docs: DataFrame, n: Int = 8,
      trainFrac: Double = 0.9): DataFrame = {
    // The split is a pure hash column, so it rides along with the gram
    // scan — no docs⋈split self-join. The corpus text is read ONCE:
    // the distinct (doc, gram) table aggregates per gram hash into
    // (seen-in-train?, [test docs containing it]), and the per-test-doc
    // rollup explodes that back out. Two shuffles total (gram hash,
    // then doc_id); no cache to leak across a long gate session. Per
    // gram the list is bounded by the gram's test-side document
    // frequency — the same row multiplicity the equivalent
    // test⟕train_grams join would produce.
    val withSplit = docs.withColumn("split", splitExpr(trainFrac))
    val all = withSplit
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), col("split"),
        explode(when(size(col("ws")) >= n,
          expr(Shingles.wordNgramsExpr("ws", n)))
          .otherwise(array().cast("array<string>"))).as("gram"))
      // 8-byte xxhash64 as the shuffle/grouping currency (the gram
      // text never leaves the scan); the oracle groups by its own md5
      // — only collision behavior must agree, and both are ~0 here
      .select(col("doc_id"), col("split"), xxhash64(col("gram")).as("g"))
      .distinct()
    val perGram = all.groupBy("g").agg(
      max(when(col("split") === "train", 1)).as("hit"),
      collect_list(when(col("split") === "test", col("doc_id"))).as("test_docs"))
    perGram
      .select(col("hit"), explode(col("test_docs")).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams_distinct"),
        count(col("hit")).as("n_contaminated"))
      .select(col("doc_id"), col("n_grams_distinct"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_grams_distinct")).as("contamination_frac"))
  }

  def contaminationSql(n: Int = 8, trainFrac: Double = 0.9): String =
    s"""WITH split AS (${trainTestSplitSql(trainFrac)}),
       |words AS (SELECT d.doc_id, s.split, string_split(d.text, ' ') AS ws
       |          FROM documents d JOIN split s USING (doc_id)),
       |grams AS (
       |  SELECT DISTINCT doc_id, split,
       |         md5(array_to_string(ws[i:i+${n - 1}], ' ')) AS g
       |  FROM words, unnest(generate_series(1, len(ws) - ${n - 1})) t(i)
       |),
       |train_g AS (SELECT DISTINCT g FROM grams WHERE split = 'train')
       |SELECT t.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_grams_distinct,
       |  CAST(count(tg.g) AS BIGINT) AS n_contaminated,
       |  CAST(count(tg.g) AS DOUBLE) / count(*) AS contamination_frac
       |FROM (SELECT doc_id, g FROM grams WHERE split = 'test') t
       |LEFT JOIN train_g tg USING (g)
       |GROUP BY 1""".stripMargin
}
