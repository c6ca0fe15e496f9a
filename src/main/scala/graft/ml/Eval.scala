package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline model-evaluation metrics computed EXACTLY and distributively
  * — the scoring loop a training pipeline runs after every checkpoint
  * (the reference's model-eval cells, P2-F1_AI_Ghost_Car_Model.ipynb,
  * eyeball losses; this is the scaled, exact form).
  *
  * Exactness strategy: both metrics reduce to INTEGER sufficient
  * statistics (tied-rank sums, per-bucket positive counts) folded with
  * long arithmetic; a double division happens exactly once per output
  * row on exact operands — one IEEE op is bit-identical across
  * engines, so the DuckDB oracle hash-matches without tolerance.
  *
  * Scale shape: AUC never sorts rows globally — one groupBy compacts
  * the corpus to (group, distinct score) counts, a keyed window walks
  * those counts; the gains table rides [[graft.ops.GlobalRank]] (range
  * buckets + offsets), so neither metric funnels data through a
  * single-partition window.
  */
object Eval {

  /** Exact ROC-AUC per `groupCol` via the tied-rank Mann–Whitney
    * identity: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum
    * of AVERAGE ranks of positives under ascending `scoreCol`.
    *
    * Rank sums stay integral by doubling: rows tied at score s have
    * average rank cum_before(s) + (n_s+1)/2, so
    * 2·R⁺ = Σ_s n⁺_s·(2·cum_before + n_s + 1) — pure long math.
    * Groups with no positives or no negatives yield NULL auc (the
    * metric is undefined, not 0.5).
    *
    * @param labelCol boolean column (true = positive)
    * @return (group, n_pos, n_neg, auc) */
  def aucRoc(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val perScore = df
      .groupBy(col(groupCol), col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_np"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("_cumb", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .groupBy(col(groupCol))
      .agg(
        sum(col("_np") * (lit(2L) * col("_cumb") + col("_n") + 1L))
          .as("_r2"),
        sum(col("_np")).as("n_pos"),
        (sum(col("_n")) - sum(col("_np"))).as("n_neg"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("_r2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("auc"))
  }

  /** DuckDB mirror of [[aucRoc]] — identical integer folds. */
  def aucRocSql(srcSql: String, groupSql: String, scoreSql: String,
      labelSql: String): String =
    s"""WITH src AS ($srcSql),
       |per_s AS (
       |  SELECT $groupSql AS grp, $scoreSql AS s, COUNT(*) AS n,
       |    SUM(CASE WHEN $labelSql THEN 1 ELSE 0 END) AS np
       |  FROM src GROUP BY 1, 2),
       |cum AS (
       |  SELECT *, COALESCE(SUM(n) OVER (PARTITION BY grp ORDER BY s
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
       |  FROM per_s),
       |g AS (
       |  SELECT grp, SUM(np * (2*cumb + n + 1)) AS r2,
       |    CAST(SUM(np) AS BIGINT) AS n_pos,
       |    CAST(SUM(n) - SUM(np) AS BIGINT) AS n_neg
       |  FROM cum GROUP BY 1)
       |SELECT grp, n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    CAST(r2 - n_pos*(n_pos+1) AS DOUBLE) /
       |      CAST(2*n_pos*n_neg AS DOUBLE) END AS auc
       |FROM g""".stripMargin

  /** Gains/lift table: rank all rows by `scoreCol` DESC (ties broken
    * by unique `tieCol` asc) via the distributed [[graft.ops.GlobalRank]],
    * cut into `buckets` equal-count slices, and report per slice the
    * positive count, lift vs the base rate, and cumulative capture —
    * the "top decile catches X% of positives" targeting table.
    *
    * lift = (np/n)/(NP/N) computed as (np·N)/(n·NP) — exact long
    * products, one double divide; capture = cum_np/NP likewise. */
  def gains(df: DataFrame, scoreCol: String, tieCol: String,
      labelCol: String, buckets: Int = 10): DataFrame = {
    // materialize the scored frame once: GlobalRank reads it three
    // times and (N, NP) need no ranks at all — computing totals from
    // the un-ranked frame skips a second pass over the rank plan
    // (scan-censused: 8 source scans without these two moves).
    // Projected to the THREE columns the table needs before pinning —
    // checkpointing a caller's full wide row measured slower than the
    // scans it saved.
    val src = df.select(col(tieCol), col(labelCol),
        (-col(scoreCol)).as("_negs"))
      .localCheckpoint(true)
    val ranked = graft.ops.GlobalRank.withGlobalRank(
      src, "_negs", tieCol, "_rn", materialize = false)
    val totals = src.agg(count(lit(1)).as("_N"),
      sum(when(col(labelCol), 1L).otherwise(0L)).as("_NP"))
    ranked.crossJoin(broadcast(totals))
      .withColumn("bucket",
        floor((col("_rn") - 1).cast("double") * buckets / col("_N"))
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        max(col("_N")).as("_N"), max(col("_NP")).as("_NP"))
      .withColumn("lift",
        (col("n_pos") * col("_N")).cast("double") /
          (col("n") * col("_NP")).cast("double"))
      .withColumn("cum_capture",
        // constant-valued (but non-foldable, so Catalyst keeps it)
        // partition key: the decile table is ≤10 rows; same
        // single-partition execution, no global-window WARN
        sum(col("n_pos")).over(
          Window.partitionBy(pmod(col("bucket"), lit(1)))
            .orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, 0)).cast("double") /
          col("_NP").cast("double"))
      .select(col("bucket"), col("n"), col("n_pos"), col("lift"),
        col("cum_capture"))
  }

  /** Per-query ranking metrics — precision@k, MRR@k, nDCG@k (binary
    * gain) — the retrieval-eval loop run after every index or ranker
    * change. One keyed window (partition = query) ranks candidates;
    * one groupBy folds the metrics: never a global sort.
    *
    * Exactness: p@k and MRR are single IEEE divides of exact longs.
    * DCG terms 1/log₂(rank+1) are rounded to 6 dp BEFORE the decimal
    * sum (libm log2 is not guaranteed correctly rounded across
    * engines; the 6-dp grid absorbs the last-ulp wobble — the
    * entropy-kernel precedent), and IDCG folds the same rounded terms
    * over the ideal prefix, so nDCG is a ratio of two exact decimals.
    *
    * @param tieCol unique within a query (makes the ranking total)
    * @return (query, n_cand, n_rel, p_at_k, mrr, ndcg) */
  def rankingMetrics(df: DataFrame, queryCol: String, scoreCol: String,
      tieCol: String, relevantCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
    val dec = "decimal(38,6)"
    val term = round(lit(1.0) / log2(col("_rk") + 1), 6).cast(dec)
    val idealTerm = round(lit(1.0) / log2(col("_i") + 1), 6).cast(dec)
    df.withColumn("_rk", row_number().over(w))
      .groupBy(col(queryCol).as("query"))
      .agg(
        count(lit(1)).as("n_cand"),
        sum(when(col(relevantCol), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col(relevantCol) && col("_rk") <= k, 1L).otherwise(0L))
          .as("_hits"),
        min(when(col(relevantCol), col("_rk"))).as("_first"),
        sum(when(col(relevantCol) && col("_rk") <= k, term)
          .otherwise(lit(0).cast(dec))).as("_dcg"))
      // IDCG over the ideal prefix of length min(n_rel, k): fold the
      // SAME rounded terms so the ratio stays exact-over-exact. The
      // n_rel=0 clamp to length 1 matters: sequence(1, 0) counts DOWN
      // in Spark and its i=0 term is 1/log2(1) = ∞ (ndcg is 0-guarded
      // for that case anyway, but ∞→decimal would throw under ANSI).
      .withColumn("_idcg", aggregate(
        sequence(lit(1), greatest(least(col("n_rel"), lit(k)), lit(1L))
          .cast("int")),
        lit(0).cast(dec),
        (acc, i) => acc + round(lit(1.0) / log2(i + 1), 6).cast(dec)))
      .withColumn("p_at_k",
        col("_hits").cast("double") / lit(k.toDouble))
      .withColumn("mrr",
        when(col("_first").isNotNull && col("_first") <= k,
          lit(1.0) / col("_first")).otherwise(0.0))
      .withColumn("ndcg",
        when(col("n_rel") > 0,
          col("_dcg").cast("double") / col("_idcg").cast("double"))
          .otherwise(0.0))
      .select(col("query"), col("n_cand"), col("n_rel"), col("p_at_k"),
        col("mrr"), col("ndcg"))
  }

  /** DuckDB mirror of [[rankingMetrics]]. */
  def rankingMetricsSql(srcSql: String, querySql: String, scoreSql: String,
      tieSql: String, relSql: String, k: Int): String =
    s"""WITH src AS ($srcSql),
       |ranked AS (
       |  SELECT $querySql AS query,
       |    CASE WHEN $relSql THEN 1 ELSE 0 END AS rel,
       |    row_number() OVER (PARTITION BY $querySql
       |      ORDER BY $scoreSql DESC, $tieSql) AS rk
       |  FROM src),
       |g AS (
       |  SELECT query, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |    CAST(SUM(rel) AS BIGINT) AS n_rel,
       |    CAST(SUM(CASE WHEN rel = 1 AND rk <= $k THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits,
       |    MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel,
       |    SUM(CASE WHEN rel = 1 AND rk <= $k THEN
       |      CAST(round(1.0 / log2(rk + 1), 6) AS DECIMAL(38,6))
       |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS dcg
       |  FROM ranked GROUP BY 1),
       |with_ideal AS (
       |  SELECT g.*, (
       |    SELECT COALESCE(SUM(CAST(round(1.0 / log2(i + 1), 6)
       |      AS DECIMAL(38,6))), CAST(0 AS DECIMAL(38,6)))
       |    FROM unnest(generate_series(1, LEAST(g.n_rel, $k))) t(i)
       |  ) AS idcg
       |  FROM g)
       |SELECT query, n_cand, n_rel,
       |  CAST(hits AS DOUBLE) / CAST($k AS DOUBLE) AS p_at_k,
       |  CASE WHEN first_rel IS NOT NULL AND first_rel <= $k
       |    THEN CAST(1.0 AS DOUBLE) / first_rel ELSE 0.0 END AS mrr,
       |  CASE WHEN n_rel > 0 THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
       |    ELSE 0.0 END AS ndcg
       |FROM with_ideal""".stripMargin

  /** DuckDB mirror of [[gains]] (plain global window — the luxury
    * GlobalRank recreates distributively). */
  def gainsSql(srcSql: String, scoreSql: String, tieSql: String,
      labelSql: String, buckets: Int = 10): String =
    s"""WITH src AS ($srcSql),
       |ranked AS (
       |  SELECT CASE WHEN $labelSql THEN 1 ELSE 0 END AS pos,
       |    row_number() OVER (ORDER BY $scoreSql DESC, $tieSql) AS rn
       |  FROM src),
       |t AS (SELECT COUNT(*) AS tot_n, SUM(pos) AS tot_np FROM ranked),
       |b AS (
       |  -- NB: totals named tot_* because DuckDB identifiers are
       |  -- case-insensitive: "N" would collide with per-bucket "n".
       |  SELECT CAST(FLOOR(CAST((rn - 1) AS DOUBLE) * $buckets / t.tot_n)
       |      AS INT) AS bucket,
       |    COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
       |    MAX(t.tot_n) AS tot_n, MAX(t.tot_np) AS tot_np
       |  FROM ranked, t GROUP BY 1)
       |SELECT bucket, n, n_pos,
       |  CAST(n_pos * tot_n AS DOUBLE) / CAST(n * tot_np AS DOUBLE) AS lift,
       |  CAST(SUM(n_pos) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |    / CAST(tot_np AS DOUBLE) AS cum_capture
       |FROM b""".stripMargin

  /** Calibration (reliability) table + exact per-bucket Brier score.
    *
    * Scores arrive as INTEGERS `kCol` ∈ [0, scale] (probability =
    * k/scale) — the form a quantized model head emits — so everything
    * reduces to long sufficient statistics:
    *   Σ(lab − k/s)² = (s²·Σlab − 2s·Σ(lab·k) + Σk²) / s²
    * and each output double is one IEEE divide on exact operands.
    * Bucket = ⌊k·buckets/scale⌋ (top edge clamped), pure integer math.
    *
    * @return (bucket, n, n_pos, avg_p, frac_pos, brier) */
  def calibration(df: DataFrame, kCol: String, scale: Int,
      labelCol: String, buckets: Int = 10): DataFrame = {
    val s2 = scale.toLong * scale
    // NB: Column./ is double division — floor() makes the bucket an
    // integer ⌊k·b/s⌋ (exact: integer-valued quotients are exactly
    // representable, so floor never straddles the boundary).
    df.withColumn("_b",
        least(floor(col(kCol).cast("long") * buckets / scale).cast("long"),
          lit(buckets - 1L)))
      .withColumn("_lab", when(col(labelCol), 1L).otherwise(0L))
      .groupBy(col("_b").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_lab")).as("n_pos"),
        sum(col(kCol).cast("long")).as("_sk"),
        sum(col(kCol).cast("long") * col(kCol)).as("_sk2"),
        sum(col("_lab") * col(kCol)).as("_slk"))
      .withColumn("avg_p",
        col("_sk").cast("double") / (col("n") * scale).cast("double"))
      .withColumn("frac_pos",
        col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("brier",
        (lit(s2) * col("n_pos") - lit(2L * scale) * col("_slk") + col("_sk2"))
          .cast("double") / (col("n") * s2).cast("double"))
      .select("bucket", "n", "n_pos", "avg_p", "frac_pos", "brier")
  }

  /** DuckDB mirror of [[calibration]]. */
  def calibrationSql(srcSql: String, kSql: String, scale: Int,
      labelSql: String, buckets: Int = 10): String = {
    val s2 = scale.toLong * scale
    s"""WITH src AS ($srcSql),
       |r AS (
       |  SELECT LEAST(($kSql) * $buckets // $scale, ${buckets - 1}) AS bucket,
       |    CASE WHEN $labelSql THEN 1 ELSE 0 END AS lab, ($kSql) AS k
       |  FROM src),
       |g AS (
       |  SELECT bucket, COUNT(*) AS n, CAST(SUM(lab) AS BIGINT) AS n_pos,
       |    CAST(SUM(k) AS BIGINT) AS sk, CAST(SUM(k*k) AS BIGINT) AS sk2,
       |    CAST(SUM(lab*k) AS BIGINT) AS slk
       |  FROM r GROUP BY 1)
       |SELECT CAST(bucket AS BIGINT) AS bucket, n, n_pos,
       |  CAST(sk AS DOUBLE) / CAST(n * $scale AS DOUBLE) AS avg_p,
       |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
       |  CAST($s2 * n_pos - ${2L * scale} * slk + sk2 AS DOUBLE)
       |    / CAST(n * $s2 AS DOUBLE) AS brier
       |FROM g""".stripMargin
  }

  /** Per-group confusion matrix + precision/recall/F1 for boolean
    * predictions — long counts, one divide per metric (NULL when the
    * denominator is 0, the metric is undefined not 0). */
  def confusionF1(df: DataFrame, groupCol: String, predCol: String,
      labelCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        sum(when(col(predCol) && col(labelCol), 1L).otherwise(0L)).as("tp"),
        sum(when(col(predCol) && !col(labelCol), 1L).otherwise(0L)).as("fp"),
        sum(when(!col(predCol) && col(labelCol), 1L).otherwise(0L)).as("fn"),
        sum(when(!col(predCol) && !col(labelCol), 1L).otherwise(0L)).as("tn"))
      .withColumn("prec", when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("rec", when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double")))
      .withColumn("f1", when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        (lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")))

  /** DuckDB mirror of [[confusionF1]]. */
  def confusionF1Sql(srcSql: String, groupSql: String, predSql: String,
      labelSql: String): String =
    s"""WITH src AS ($srcSql),
       |g AS (
       |  SELECT $groupSql AS grp,
       |    CAST(SUM(CASE WHEN ($predSql) AND ($labelSql) THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN ($predSql) AND NOT ($labelSql) THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN NOT ($predSql) AND ($labelSql) THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(SUM(CASE WHEN NOT ($predSql) AND NOT ($labelSql) THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM src GROUP BY 1)
       |SELECT grp, tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
       |  CASE WHEN tp + fn > 0
       |    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rec,
       |  CASE WHEN 2*tp + fp + fn > 0
       |    THEN CAST(2*tp AS DOUBLE) / CAST(2*tp + fp + fn AS DOUBLE) END AS f1
       |FROM g""".stripMargin

  /** Per-group Cohen's κ for two boolean raters — the inter-annotator
    * agreement check a labeling pipeline runs before trusting labels.
    *
    * Single-divide exactness: κ = (po−pe)/(1−pe) algebraically
    * rearranged over a common denominator n² so both numerator and
    * denominator are LONG products:
    *   κ = (n·agree − marg) / (n² − marg),
    *   marg = (n11+n10)(n11+n01) + (n01+n00)(n10+n00).
    * po and pe are also emitted (one divide each). κ is NULL for the
    * degenerate pe = 1 case. Rows where EITHER rater is NULL are
    * excluded entirely (they can land in none of the four cells, so
    * counting them in n would silently bias po/pe/κ). */
  def cohensKappa(df: DataFrame, groupCol: String, r1Col: String,
      r2Col: String): DataFrame =
    df.filter(col(r1Col).isNotNull && col(r2Col).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(r1Col) && col(r2Col), 1L).otherwise(0L)).as("_n11"),
        sum(when(col(r1Col) && !col(r2Col), 1L).otherwise(0L)).as("_n10"),
        sum(when(!col(r1Col) && col(r2Col), 1L).otherwise(0L)).as("_n01"),
        sum(when(!col(r1Col) && !col(r2Col), 1L).otherwise(0L)).as("_n00"))
      .withColumn("_agree", col("_n11") + col("_n00"))
      .withColumn("_marg",
        (col("_n11") + col("_n10")) * (col("_n11") + col("_n01")) +
          (col("_n01") + col("_n00")) * (col("_n10") + col("_n00")))
      .withColumn("po", col("_agree").cast("double") / col("n").cast("double"))
      .withColumn("pe",
        col("_marg").cast("double") / (col("n") * col("n")).cast("double"))
      .withColumn("kappa",
        when(col("n") * col("n") =!= col("_marg"),
          (col("n") * col("_agree") - col("_marg")).cast("double") /
            (col("n") * col("n") - col("_marg")).cast("double")))
      .select(col(groupCol), col("n"), col("po"), col("pe"), col("kappa"))

  /** DuckDB mirror of [[cohensKappa]]. */
  def cohensKappaSql(srcSql: String, groupSql: String, r1Sql: String,
      r2Sql: String): String =
    s"""WITH src AS ($srcSql),
       |g AS (
       |  SELECT $groupSql AS grp, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN ($r1Sql) AND ($r2Sql) THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |    CAST(SUM(CASE WHEN ($r1Sql) AND NOT ($r2Sql) THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |    CAST(SUM(CASE WHEN NOT ($r1Sql) AND ($r2Sql) THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |    CAST(SUM(CASE WHEN NOT ($r1Sql) AND NOT ($r2Sql) THEN 1 ELSE 0 END) AS BIGINT) AS n00
       |  FROM src
       |  WHERE ($r1Sql) IS NOT NULL AND ($r2Sql) IS NOT NULL
       |  GROUP BY 1),
       |k AS (
       |  SELECT grp, n, n11 + n00 AS agree,
       |    (n11 + n10)*(n11 + n01) + (n01 + n00)*(n10 + n00) AS marg
       |  FROM g)
       |SELECT grp, n,
       |  CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
       |  CAST(marg AS DOUBLE) / CAST(n * n AS DOUBLE) AS pe,
       |  CASE WHEN n * n <> marg THEN
       |    CAST(n * agree - marg AS DOUBLE) / CAST(n * n - marg AS DOUBLE)
       |  END AS kappa
       |FROM k""".stripMargin
}
