package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-linear (HDR-style) quantile histogram — the integer-exact
  * mergeable quantile sketch: values bucket by (bit-length, top `k`
  * sub-bits), giving ≤ 2^-k relative error with a bucket count that
  * grows with the LOG of the value range, not its cardinality (the
  * approx_percentile/GK alternative whose compressed state has no
  * engine-independent spelling — this one is pure integer arithmetic,
  * so the WHOLE sketch replays hash-exactly in the oracle).
  *
  * Bucketing (the HdrHistogram/DDSketch collapsed-store construction),
  * for x ≥ 0 (negatives mirror-map: bucket(x) = −bucket(−x), see
  * [[bucketLoSql]]):
  *  - x < 2^(k+1): exact (bucket = x);
  *  - else b = bitlength(x), shift = b−1−k, sub = (x >> shift) & (2^k−1),
  *    bucket lower bound = (2^k + sub) << shift. Bucket width is
  *    2^shift ≤ lo/2^k → relative error ≤ 2^-k.
  *
  * Quantile q (per-mille) = the smallest bucket bound whose
  * cumulative count reaches ceil(q·n/1000) — within 2^-k relative of
  * the type-1 exact quantile (HdrHistogramSpec). SIGN CAVEAT on the
  * bound's direction (r13 ADVICE item 2): the reported `p<q>_lo` is a
  * lower bound in VALUE order only for non-negative quantiles; a
  * NEGATIVE quantile's bound is the mirrored magnitude bound, i.e. an
  * UPPER bound in value order (lo ≥ x, |lo| ≤ |x| — the mirror map
  * bucket(x) = −bucket(−x) reflects the bucket's low edge). Consumers
  * needing a one-sided bound on signed data must branch on sign; the
  * 2^-k relative-error envelope holds on both branches.
  *
  * Scale shape: one scan → one (grp, bucket) aggregation with map-side
  * combine; the cumulative window runs on the HISTOGRAM (≤ ~60·2^k
  * rows per group), never the data. Shard histograms merge by count
  * addition, BIT-identically to a single-pass rebuild.
  */
object HdrHistogram {

  /** Bucket bound of the NON-NEGATIVE branch (SQL, shared verbatim by
    * the Spark `expr` and the DuckDB oracle modulo the long-literal
    * suffix). Callers go through the signed wrappers below. */
  private def bucketLoNonNegSpark(x: String, k: Int): String = {
    val lim = 1L << (k + 1); val base = 1L << k; val mask = base - 1
    s"CASE WHEN $x < ${lim}L THEN $x ELSE " +
      s"shiftleft(${base}L + (shiftright($x, length(bin($x)) - ${k + 1}) & ${mask}L), " +
      s"length(bin($x)) - ${k + 1}) END"
  }

  private def bucketLoNonNegSql(x: String, k: Int): String = {
    val lim = 1L << (k + 1); val base = 1L << k; val mask = base - 1
    s"CASE WHEN $x < $lim THEN $x ELSE " +
      s"(($base + (($x >> (length(bin($x)) - ${k + 1})) & ${mask}::BIGINT)) " +
      s"<< (length(bin($x)) - ${k + 1})) END"
  }

  /** Signed bucket bound: negatives mirror-map through the magnitude
    * (bucket(x) = −bucket(−x)), so the bounded-bucket contract — O(2^k
    * · log range) buckets, ≤2^-k relative error — holds on the WHOLE
    * long domain except Long.MinValue (whose negation overflows; under
    * ANSI arithmetic that fails LOUDLY rather than mis-bucketing).
    * The map is monotone (x₁ ≤ x₂ ⟹ bucket(x₁) ≤ bucket(x₂)), so
    * cumulative-count quantile reads stay correct; a negative
    * quantile's reported bound is the mirrored magnitude bound (within
    * 2^-k relative of |x|, from above in value order). Pre-r13 this
    * spelling admitted negatives into exact singleton buckets —
    * correct values but an UNBOUNDED bucket count on negative-heavy
    * data (r12 verdict item 5). */
  private def bucketLoSpark(x: String, k: Int): String =
    s"CASE WHEN $x >= 0L THEN ${bucketLoNonNegSpark(x, k)} " +
      s"ELSE -(${bucketLoNonNegSpark(s"(-($x))", k)}) END"

  /** DuckDB spelling of the signed bucket bound. */
  def bucketLoSql(x: String, k: Int): String =
    s"CASE WHEN $x >= 0 THEN ${bucketLoNonNegSql(x, k)} " +
      s"ELSE -(${bucketLoNonNegSql(s"(-($x))", k)}) END"

  /** Scala reference of the bucket bound (spec witness). */
  def bucketLoRef(x: Long, k: Int): Long = {
    require(x != Long.MinValue, "bucketLoRef: -x must be representable")
    if (x < 0) -bucketLoRef(-x, k)
    else if (x < (1L << (k + 1))) x
    else {
      val b = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val shift = b - 1 - k
      ((1L << k) + ((x >> shift) & ((1L << k) - 1))) << shift
    }
  }

  /** The mergeable state: per-(group, bucket) counts. NULL values are
    * dropped (a NULL bucket would poison quantile mass, and the two
    * engines order NULLs oppositely in the cumulative window). */
  def histogram(df: DataFrame, grpCol: String, xCol: String,
      k: Int): DataFrame =
    df.filter(col(xCol).isNotNull)
      .select(col(grpCol), expr(bucketLoSpark(xCol, k)).as("lo"))
      .groupBy(col(grpCol), col("lo"))
      .agg(count(lit(1)).as("cnt"))

  /** Shared quantile finisher over a (part, lo, cnt) histogram frame:
    * cumulative window + per-mille threshold reads — ONE spelling for
    * the grouped and rolling faces (a rounding-rule change must not
    * be able to de-synchronize them). */
  private def quantileReport(hist: DataFrame, partCol: String,
      qsPerMille: Seq[Int]): DataFrame = {
    val cum = hist
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(partCol).orderBy("lo")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(partCol)))
    val qCols = qsPerMille.map { q =>
      min(when(col("cum") >= expr(s"(n * $q + 999) div 1000"), col("lo")))
        .as(s"p${q}_lo")
    }
    cum.groupBy(col(partCol))
      .agg(max(col("n")).as("n_rows"),
        (count(lit(1)).as("n_buckets") +: qCols): _*)
  }

  /** Per-group quantile report off the histogram: n_rows, bucket
    * count, and one `p<q>_lo` column per requested per-mille q.
    * `p<q>_lo` is a value-order LOWER bound only for non-negative
    * quantiles; on the signed domain a negative quantile's bound is
    * mirrored (an upper bound in value order — see the object doc's
    * sign caveat). */
  def quantiles(df: DataFrame, grpCol: String, xCol: String, k: Int,
      qsPerMille: Seq[Int]): DataFrame =
    quantileReport(histogram(df, grpCol, xCol, k), grpCol, qsPerMille)

  /** Rolling-window quantiles from per-day histograms — the sketch
    * merge in the TIME dimension: persist one (day, bucket, cnt) row
    * set per ingest day, answer any trailing-`windowDays` percentile
    * by count addition over the histograms, never a raw rescan. Each
    * daily bucket row fans out to the ≤`windowDays` window ends it
    * serves (an EQUI broadcast join against the observed-day dim — no
    * nested loop), so the whole computation after the one scan runs
    * on histogram-sized frames. HdrHistogramSpec pins the merged
    * window histogram BIT-identical to a direct histogram of the
    * window's raw rows, and the quantile bounds against exact.
    * `df` must carry a long day id `dayCol` and a long `xCol`
    * (negatives mirror-map; Long.MinValue excluded). Output:
    * (day, n_rows, n_buckets, p<q>_lo...). */
  def rollingQuantiles(df: DataFrame, dayCol: String, xCol: String,
      k: Int, windowDays: Int, qsPerMille: Seq[Int]): DataFrame = {
    // pinned: the histogram-sized daily frame feeds both the day dim
    // and the fan-out (scan census: one source scan)
    val daily = histogram(
      df.select(col(dayCol).as("day"), col(xCol).as("x")), "day", "x", k)
      .localCheckpoint(true)
    val days = daily.select(col("day").as("d")).distinct()
    val rolled = daily
      .withColumn("d", explode(expr(s"sequence(day, day + ${windowDays - 1})")))
      .join(broadcast(days), "d")
      .groupBy(col("d").as("day"), col("lo")).agg(sum(col("cnt")).as("cnt"))
    quantileReport(rolled, "day", qsPerMille)
  }

  /** Shared SQL finisher (the [[quantileReport]] twin): cum window +
    * threshold reads over a histogram CTE exposing (part, lo, cnt).
    * One spelling for both mirrors. */
  private def reportSql(part: String, histCte: String,
      qsPerMille: Seq[Int]): String = {
    val qSelects = qsPerMille.map { q =>
      s"CAST(MIN(CASE WHEN cum >= (n * $q + 999) // 1000 THEN lo END) " +
        s"AS BIGINT) AS p${q}_lo"
    }.mkString(",\n  ")
    s"""hdrcum AS (SELECT $part, lo, cnt,
       |  SUM(cnt) OVER (PARTITION BY $part ORDER BY lo) AS cum,
       |  SUM(cnt) OVER (PARTITION BY $part) AS n FROM $histCte)
       |SELECT $part, CAST(MAX(n) AS BIGINT) AS n_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |  $qSelects
       |FROM hdrcum GROUP BY 1""".stripMargin
  }

  /** DuckDB mirror of [[rollingQuantiles]]. `srcSql` must select a
    * long `day` and a BIGINT `x` (negatives mirror-map). */
  def rollingQuantilesSql(srcSql: String, k: Int, windowDays: Int,
      qsPerMille: Seq[Int]): String =
    s"""WITH hdrrsrc AS ($srcSql),
       |hdrrd AS (SELECT day, ${bucketLoSql("x", k)} AS lo, COUNT(*) AS cnt
       |  FROM hdrrsrc WHERE x IS NOT NULL GROUP BY 1, 2),
       |hdrrdays AS (SELECT DISTINCT day AS d FROM hdrrd),
       |hdrrc AS (SELECT unnest(generate_series(day, day + ${windowDays - 1})) AS d,
       |  lo, cnt FROM hdrrd),
       |hdrroll AS (SELECT c.d AS day, c.lo, CAST(SUM(c.cnt) AS BIGINT) AS cnt
       |  FROM hdrrc c JOIN hdrrdays dd ON dd.d = c.d GROUP BY 1, 2),
       |${reportSql("day", "hdrroll", qsPerMille)}""".stripMargin

  /** DuckDB mirror of [[quantiles]]. `srcSql` must select the group
    * column (named `grpCol`) and a BIGINT `x` (negatives mirror-map). */
  def quantilesSql(srcSql: String, grpCol: String, k: Int,
      qsPerMille: Seq[Int]): String =
    s"""WITH hdrsrc AS ($srcSql),
       |hdrh AS (SELECT $grpCol, ${bucketLoSql("x", k)} AS lo, COUNT(*) AS cnt
       |  FROM hdrsrc WHERE x IS NOT NULL GROUP BY 1, 2),
       |${reportSql(grpCol, "hdrh", qsPerMille)}""".stripMargin
}
