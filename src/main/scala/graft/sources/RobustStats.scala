package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier detection — the quality-monitoring twin
  * of mean/stddev z-scores that a heavy-tailed corpus actually needs
  * (document lengths are lognormal-ish; one 100 MB crawl artifact
  * drags a mean-based threshold far more than a median-based one).
  * Flags rows where |x − median| > k · MAD per group, the standard
  * robust rule (k = 3).
  *
  * Scale shape: the corpus collapses to per-(group, value) counts in
  * ONE shuffle — document lengths have a bounded distinct domain, so
  * every percentile afterwards runs on the small distinct-value table
  * via Spark's weighted `percentile(value, p, freq)`, never buffering
  * corpus rows. Both medians and the outlier counts ride that same
  * pre-aggregate; nothing downstream touches the corpus again. At
  * 100 TB the distinct table is ~groups × |domain| rows (≪ corpus);
  * if a value domain were unbounded (true reals), swap the exact
  * percentile for approx_percentile and keep the identical shape.
  *
  * Determinism/oracle: medians of integer-valued data interpolate at
  * exact halves (frac ∈ {0, 0.5}, lo/hi integers), so Spark's
  * `percentile` and DuckDB's `quantile_cont` agree bit-for-bit here
  * (the 1-ULP lerp-order hazard needs a fractional frac to bite —
  * see the a_percentiles gate); deviations are exact .0/.5 doubles,
  * so the MAD median is exact too.
  */
object RobustStats {

  /** Per-group robust length profile over `df`'s integer column
    * `valueCol`: (group, n_docs, med, mad, n_outliers) with
    * n_outliers = #rows where |x − med| > k·MAD. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    // ONE corpus shuffle: distinct-value counts per group. Pinned —
    // the median pass and the deviation chain (referenced twice
    // itself) would otherwise each re-run the corpus groupBy
    // (scan census: 4 → 1 source scans)
    val counts = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val med = counts.groupBy(col(groupCol))
      .agg(expr("percentile(v, 0.5, c)").as("med"))
    val dev = counts.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col("v").cast("double") - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("percentile(dev, 0.5, c)").as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(
        sum(col("c")).as("n_docs"),
        round(max(col("med")), 6).as("med"),
        round(max(col("mad")), 6).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), col("c"))
          .otherwise(lit(0L))).as("n_outliers"))
  }

  /** DuckDB mirror of [[madOutliers]] over documents(lang, n_chars). */
  def madOutliersSql(k: Double = 3.0): String =
    s"""WITH med AS (
       |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
       |  FROM documents GROUP BY 1),
       |dv AS (
       |  SELECT d.lang, abs(CAST(d.n_chars AS DOUBLE) - m.med) AS dev, m.med
       |  FROM documents d JOIN med m ON d.lang = m.lang),
       |mad AS (
       |  SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY 1)
       |SELECT dv.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  ROUND(MAX(dv.med), 6) AS med,
       |  ROUND(MAX(mad.mad), 6) AS mad,
       |  CAST(SUM(CASE WHEN dv.dev > CAST($k AS DOUBLE) * mad.mad
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM dv JOIN mad ON dv.lang = mad.lang
       |GROUP BY 1""".stripMargin
}
