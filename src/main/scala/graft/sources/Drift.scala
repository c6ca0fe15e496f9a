package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution drift between two corpus snapshots via the Population
  * Stability Index — the monitoring primitive that pages a pipeline
  * owner when yesterday's ingest stops looking like the training
  * distribution: PSI = Σ_bins (p_new − p_old)·ln(p_new / p_old),
  * with Laplace-smoothed bin proportions so empty bins stay finite.
  * Rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken.
  *
  * Scale shape: each side is one partial-aggregated groupBy down to
  * (group, bin) counts — the join and PSI math run on bins × groups
  * rows, never corpus rows. Exactness: proportions are exact
  * rationals (long counts), each PSI term is rounded to 6 dp before
  * the decimal-exact sum (the entropy-kernel precedent — ln may
  * differ in the last ulp across engines; the 6-dp grid absorbs it).
  */
object Drift {

  /** PSI per `groupCol` between `oldDf` and `newDf` over `valueCol`
    * bucketed into `bins` fixed-width bins of [0, hi); values outside
    * the range clamp into the edge bins (an unclamped negative would
    * bin below the spine and silently vanish from the totals). */
  def psi(oldDf: DataFrame, newDf: DataFrame, groupCol: String,
      valueCol: String, hi: Double, bins: Int = 8): DataFrame = {
    def binned(df: DataFrame, n: String) = df
      .withColumn("bin", greatest(
        least(floor(col(valueCol) / hi * bins), lit(bins - 1)),
        lit(0)).cast("int"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as(n))
    // group×bin bounded; the group spine derives from them (a group
    // with ≥1 row survives its groupBy), so each side is scanned once
    // instead of twice (scan census: 4 → 2 source scans)
    val oldB = binned(oldDf, "n_old").localCheckpoint(true)
    val newB = binned(newDf, "n_new").localCheckpoint(true)
    val spine = oldB.select(col(groupCol)).distinct()
      .unionByName(newB.select(col(groupCol)).distinct()).distinct()
      .select(col(groupCol),
        explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val joined = spine
      .join(oldB, Seq(groupCol, "bin"), "left")
      .join(newB, Seq(groupCol, "bin"), "left")
      .na.fill(0L, Seq("n_old", "n_new"))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val smoothedP = (n: String) =>
      (col(n) + 1).cast("double") /
        (sum(col(n)).over(wG) + bins).cast("double")
    joined
      .withColumn("p_old", smoothedP("n_old"))
      .withColumn("p_new", smoothedP("n_new"))
      .withColumn("term",
        round((col("p_new") - col("p_old")) *
          log(col("p_new") / col("p_old")), 6))
      .groupBy(col(groupCol))
      .agg(graft.queries.QueryDsl.dsum(col("term")).as("psi"),
        sum(col("n_old")).as("n_old_rows"),
        sum(col("n_new")).as("n_new_rows"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group — the
    * binning-free complement to [[psi]]: KS = max_x |F_old(x) −
    * F_new(x)| over the empirical CDFs. PSI answers "how much mass
    * moved between coarse bins"; KS catches a pure location/shape
    * shift at full resolution with no bin-width tuning, and its null
    * distribution (√n · KS) is the classical drift alarm threshold.
    *
    * Scale shape: each side collapses to (group, value) counts in one
    * partial-aggregated shuffle; the CDF windows and the max run over
    * the distinct-value table (groups × |value domain| rows), never
    * corpus rows — identical footprint to the PSI math.
    * Determinism: cumulative counts are exact longs; each CDF gap is
    * one divide+subtract (bit-identical cross-engine); MAX is
    * order-free, so no summation-order hazard exists at all. */
  def ks(oldDf: DataFrame, newDf: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) = df
      .groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as(n))
    // group×value bounded and referenced by spine AND join — pinned so
    // each side is scanned once (same shape as [[psi]])
    val o = counts(oldDf, "n_old").localCheckpoint(true)
    val n = counts(newDf, "n_new").localCheckpoint(true)
    val spine = o.select(col(groupCol), col("v"))
      .unionByName(n.select(col(groupCol), col("v"))).distinct()
    val joined = spine
      .join(o, Seq(groupCol, "v"), "left")
      .join(n, Seq(groupCol, "v"), "left")
      .na.fill(0L, Seq("n_old", "n_new"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("v"))
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    joined
      .withColumn("c_old", sum(col("n_old")).over(wCum))
      .withColumn("c_new", sum(col("n_new")).over(wCum))
      .withColumn("t_old", sum(col("n_old")).over(wG))
      .withColumn("t_new", sum(col("n_new")).over(wG))
      .groupBy(col(groupCol))
      .agg(
        round(max(abs(col("c_old").cast("double") / col("t_old").cast("double") -
          col("c_new").cast("double") / col("t_new").cast("double"))), 6).as("ks"),
        max(col("t_old")).as("n_old_rows"),
        max(col("t_new")).as("n_new_rows"))
  }

  /** DuckDB mirror of [[ks]]. */
  def ksSql(oldSql: String, newSql: String, groupCol: String,
      valueCol: String): String =
    s"""WITH ob AS (
       |  SELECT $groupCol, $valueCol AS v, CAST(count(*) AS BIGINT) AS n_old
       |  FROM ($oldSql) o GROUP BY 1, 2),
       |nb AS (
       |  SELECT $groupCol, $valueCol AS v, CAST(count(*) AS BIGINT) AS n_new
       |  FROM ($newSql) nn GROUP BY 1, 2),
       |spine AS (
       |  SELECT $groupCol, v FROM ob UNION SELECT $groupCol, v FROM nb),
       |j AS (
       |  SELECT s.$groupCol, s.v,
       |    COALESCE(o.n_old, 0) AS n_old, COALESCE(n.n_new, 0) AS n_new
       |  FROM spine s
       |  LEFT JOIN ob o ON s.$groupCol = o.$groupCol AND s.v = o.v
       |  LEFT JOIN nb n ON s.$groupCol = n.$groupCol AND s.v = n.v),
       |c AS (
       |  SELECT $groupCol, v,
       |    sum(n_old) OVER w AS c_old, sum(n_new) OVER w AS c_new,
       |    sum(n_old) OVER (PARTITION BY $groupCol) AS t_old,
       |    sum(n_new) OVER (PARTITION BY $groupCol) AS t_new
       |  FROM j WINDOW w AS (PARTITION BY $groupCol ORDER BY v))
       |SELECT $groupCol,
       |  ROUND(MAX(ABS(CAST(c_old AS DOUBLE) / CAST(t_old AS DOUBLE) -
       |    CAST(c_new AS DOUBLE) / CAST(t_new AS DOUBLE))), 6) AS ks,
       |  CAST(MAX(t_old) AS BIGINT) AS n_old_rows,
       |  CAST(MAX(t_new) AS BIGINT) AS n_new_rows
       |FROM c GROUP BY 1""".stripMargin

  /** DuckDB oracle: identical binning, smoothing, term rounding. */
  def psiSql(oldSql: String, newSql: String, groupCol: String,
      valueCol: String, hi: Double, bins: Int = 8): String =
    s"""WITH old_b AS (
       |  SELECT $groupCol, CAST(GREATEST(LEAST(floor($valueCol / $hi * $bins),
       |    ${bins - 1}), 0) AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_old
       |  FROM ($oldSql) o GROUP BY 1, 2),
       |new_b AS (
       |  SELECT $groupCol, CAST(GREATEST(LEAST(floor($valueCol / $hi * $bins),
       |    ${bins - 1}), 0) AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_new
       |  FROM ($newSql) nn GROUP BY 1, 2),
       |spine AS (
       |  SELECT g.$groupCol, CAST(i AS INT) AS bin
       |  FROM (SELECT $groupCol FROM old_b UNION
       |        SELECT $groupCol FROM new_b) g,
       |    unnest(generate_series(0, ${bins - 1})) s(i)),
       |j AS (
       |  SELECT s.$groupCol, s.bin,
       |    COALESCE(o.n_old, 0) AS n_old, COALESCE(n.n_new, 0) AS n_new
       |  FROM spine s
       |  LEFT JOIN old_b o ON s.$groupCol = o.$groupCol AND s.bin = o.bin
       |  LEFT JOIN new_b n ON s.$groupCol = n.$groupCol AND s.bin = n.bin),
       |p AS (
       |  SELECT $groupCol, bin, n_old, n_new,
       |    CAST(n_old + 1 AS DOUBLE) /
       |      CAST(sum(n_old) OVER (PARTITION BY $groupCol) + $bins AS DOUBLE) AS p_old,
       |    CAST(n_new + 1 AS DOUBLE) /
       |      CAST(sum(n_new) OVER (PARTITION BY $groupCol) + $bins AS DOUBLE) AS p_new
       |  FROM j)
       |SELECT $groupCol,
       |  ${graft.queries.QueryDsl.dsumSql("round((p_new - p_old) * ln(p_new / p_old), 6)")} AS psi,
       |  CAST(sum(n_old) AS BIGINT) AS n_old_rows,
       |  CAST(sum(n_new) AS BIGINT) AS n_new_rows
       |FROM p GROUP BY 1""".stripMargin
}
