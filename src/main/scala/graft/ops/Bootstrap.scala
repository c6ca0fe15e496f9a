package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryDsl.{dsum, dsumSql}

/** Poisson bootstrap confidence intervals — uncertainty quantification
  * for grouped metrics at corpus scale WITHOUT resampling shuffles
  * (Chamandy et al., "Estimating Uncertainty for Massive Data Streams";
  * the standard web-scale bootstrap).
  *
  * Classic bootstrap resamples n-of-n per replicate — unusable when
  * rows live on 1000 executors. The Poisson trick: row r's multiplicity
  * in replicate b is an independent Poisson(1) draw, so each row emits
  * its (replicate, multiplicity) pairs LOCALLY — one narrow explode of
  * B replicate ids per row, one (group, replicate) aggregate, one
  * bounded per-group order statistic over the B estimates. Nothing
  * global, no per-replicate scans.
  *
  * Determinism/oracle-exactness: the "draw" is the md5-derived integer
  * u = conv(md5(id:b)[1..6], 16) mod 10⁶ cut by the Poisson(1) CDF
  * thresholds (0.367879/0.735759/0.919699/0.980998/0.996340 — the
  * partial sums of e⁻¹/k!, capped at 5) — reproducible on any engine
  * with md5, which is the same trick the weighted sampler uses
  * (Sampling.weightedSample). Replicate means are decimal-exact sums
  * with one divide; the CI bounds are exact order statistics (index
  * ⌈p·B'⌉, no interpolation) over the B' NON-NULL replicate estimates.
  * A replicate whose total multiplicity is 0 (probability e^-n per
  * replicate — ~37% per replicate for a 1-row group) has no estimate
  * and is excluded on BOTH engines before ranking; the returned `b`
  * column reports the surviving replicate count, so small-group CIs
  * are order statistics over b ≤ B replicates rather than NULL.
  *
  * @return (group, n, mean, ci_lo, ci_hi, b) one row per group */
object Bootstrap {

  private[graft] val CdfThresholds = Seq(367879L, 735759L, 919699L, 980998L, 996340L)

  /** Multiplicity column from the deterministic per-(row, replicate)
    * uniform: inverse Poisson(1) CDF over the 10⁶ grid. Expects the
    * replicate id in a column named `b`. private[graft]: the paired
    * -bootstrap BLEU gate ([[graft.text.NgramEval.bleu4PairedBootstrap]])
    * rides the SAME draw so the md5 replicate-hash convention has one
    * spelling. */
  private[graft] def multiplicity(idCol: String) = {
    val u = graft.functions.Md5PrefixLong(
      concat_ws(":", col(idCol), col("b")), 6) % 1000000L
    CdfThresholds.zipWithIndex.foldRight(lit(CdfThresholds.size): org.apache.spark.sql.Column) {
      case ((thr, k), acc) => when(u < thr, k).otherwise(acc)
    }
  }

  /** Production multiplicity: same inverse-CDF grid, but the uniform
    * comes from Spark's native codegen'd xxhash64 over (id, b) instead
    * of the md5→hex→conv string chain — measured ~25× faster on the
    * explode+hash stage (PLANS_NOTES.md). No DuckDB spelling (DuckDB
    * lacks xxhash64), so gates on this path are Spark-anchored:
    * n/mean are randomness-independent and must equal the md5 path's;
    * the draw itself is pinned by partitioning-invariance and interval
    * sanity in BootstrapSpec. */
  private def multiplicityFast(idCol: String) = {
    val u = pmod(xxhash64(col(idCol), col("b")), lit(1000000L))
    CdfThresholds.zipWithIndex.foldRight(lit(CdfThresholds.size): org.apache.spark.sql.Column) {
      case ((thr, k), acc) => when(u < thr, k).otherwise(acc)
    }
  }

  private[graft] def multiplicitySql(idSql: String): String = {
    val u = s"CAST(concat('0x', substring(md5(concat($idSql, ':', b)), 1, 6)) AS BIGINT) % 1000000"
    val cases = CdfThresholds.zipWithIndex
      .map { case (thr, k) => s"WHEN $u < $thr THEN $k" }.mkString(" ")
    s"CASE $cases ELSE ${CdfThresholds.size} END"
  }

  /** DuckDB mirror of [[multiplicityFast]]'s draw as STAGED CTEs —
    * Spark's seed-chained `xxhash64(id, b)` spelled exactly in HUGEINT
    * u64 arithmetic (graft.util.DuckHash), then Spark's `pmod` on the
    * SIGNED value. Retires the "no DuckDB spelling" limitation: the
    * fast gate is oracle-gated like the md5 twin. Vectorized pipeline,
    * not nested lambdas: at sf0.01 this oracle evaluates ~30 M draws
    * (600 k rows × 50 replicates) and the lambda form took 155 s vs
    * seconds staged. Returns (cteText, lastCteName); the last CTE
    * exposes (grp, v, b, m). */
  private def multiplicityFastCtes(src: String): (String, String) = {
    import graft.util.DuckHash._
    val carry = Seq("grp", "v", "b")
    val stages = xxhash64LongStages("42::HUGEINT") ++ xxhash64IntStages("b")
    val (hashCtes, lastHash) = stagedCtes(src, carry, stages, "wmh")
    val cases = CdfThresholds.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }.mkString(" ")
    val text = s"""$hashCtes,
       |wmu AS (SELECT grp, v, b,
       |  (((${toSigned("h")} % 1000000) + 1000000) % 1000000) AS u
       |  FROM $lastHash),
       |wm AS (SELECT grp, v, b,
       |  CASE $cases ELSE ${CdfThresholds.size} END AS m FROM wmu)""".stripMargin
    (text, "wm")
  }

  /** Bootstrap CI for the per-group MEAN of `valueCol`. `idCol` must be
    * a unique row id (the randomness seed). `loPct`/`hiPct` in (0,1). */
  /** @param integerValued caller guarantees `valueCol` is
    *        integer-valued with bounded Σ|v|·m < 2⁶³ — replicate sums
    *        then ride codegen'd LONG aggregation instead of the
    *        BigDecimal path (measured 55.7 s → see gate notes). */
  def meanCi(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, b: Int = 100, loPct: Double = 0.025,
      hiPct: Double = 0.975, integerValued: Boolean = false,
      fastHash: Boolean = false): DataFrame = {
    require(b >= 2 && loPct > 0 && hiPct < 1 && loPct < hiPct)
    // r15 optimization, integer-valued path: draw all B multiplicities
    // per row in ONE array expression ([[graft.functions.PoissonDraws]]
    // — bit-identical md5/xxh64 draws, id hashed once per row instead
    // of once per replicate). Two aggregation spellings, picked by the
    // draw cost (both measured, see OPTIMIZATION_r15.md §4):
    //  - md5 mode (draw-dominated: 50 digests/row): 2B plain sum()
    //    columns over the ORIGINAL row count — no Generate at all, the
    //    replicate dimension re-expands from groups×1 rows after
    //    aggregation. (A typed array-buffer Aggregator was measured
    //    SLOWER — per-row Seq[Long] deserialization; and the 2B-column
    //    spelling was measured slower than posexplode at the fast
    //    gate's 10× volume — the 101-agg update loop beats codegen's
    //    fast hashmap.)
    //  - xxh64 mode (cheap draw, full volume): the classic exploded
    //    (grp, b) hash agg with the inline xxhash64(id, b) draw —
    //    measured FASTER than both vector spellings here (2.09 s vs
    //    3.06 wide / 3.35 posexplode-of-drawn-array at sf0.1): the
    //    draw is ~free in codegen, so the per-row 50-long array
    //    allocation only adds overhead.
    // Sums are order-independent longs, so every estimate is identical
    // to the exploded spelling's (BootstrapSpec pins vector ≡ exploded
    // on both hash modes). The double-valued path keeps the exploded
    // dsum spelling (decimal sums don't fit a long-vector buffer).
    val perReplicate = if (integerValued && !fastHash) {
      val aggs =
        (0 until b).map(i => sum(expr(s"ms[$i] * vl")).as(s"_smv$i")) ++
          (0 until b).map(i => sum(expr(s"ms[$i]")).as(s"_sm$i")) :+
          count(col("vl")).as("_nn")
      df.select(col(groupCol).as("grp"),
          col(valueCol).cast("long").as("vl"),
          graft.functions.PoissonDraws(col(idCol).cast("string"), b)
            .as("ms"))
        .groupBy(col("grp"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("grp"), col("_nn"),
          array((0 until b).map(i => col(s"_smv$i")): _*).as("smv"),
          array((0 until b).map(i => col(s"_sm$i")): _*).as("sm"))
        .select(col("grp"), col("_nn"), col("smv"), col("sm"),
          explode(expr(s"sequence(0, ${b - 1})")).as("b"))
        // NULL-over-empty parity with sum(): a group with no non-NULL
        // v yields NULL estimates, dropped like the exploded spelling
        .select(col("grp"), col("b"),
          when(col("_nn") > 0L && expr("sm[b]") > 0L,
            expr("CAST(smv[b] AS DOUBLE)") / expr("sm[b]")).as("est"))
        .filter(col("est").isNotNull)
    } else {
      val exploded = df
        .select(col(groupCol).as("grp"), col(valueCol).as("v"),
          col(idCol).as("_id"))
        .withColumn("b", explode(expr(s"sequence(0, ${b - 1})")))
        .withColumn("m",
          if (fastHash) multiplicityFast("_id") else multiplicity("_id"))
      val repSum =
        if (integerValued) sum(col("v").cast("long") * col("m")).cast("double")
        else dsum(col("v") * col("m"))
      exploded
        .groupBy(col("grp"), col("b"))
        // the when() guard keeps ANSI mode from raising DIVIDE_BY_ZERO
        // on a degenerate replicate — its est is NULL, dropped below
        .agg(when(sum(col("m")) > 0L, repSum / sum(col("m"))).as("est"))
        // a replicate whose total multiplicity is 0 (probability e^-n
        // per replicate — real for 1-row groups) yields est = sum/0 =
        // NULL; Spark ranks NULLs first while DuckDB ranks them last,
        // so NULLs must never reach the ranking. Drop them and index
        // off the per-group NON-NULL count (== b when no replicate
        // degenerates, so large-group results are unchanged).
        .filter(col("est").isNotNull)
    }
    // exact order statistics over the surviving replicate estimates
    // (bounded by B, small — the window partitions by group)
    val w = Window.partitionBy(col("grp")).orderBy(col("est"), col("b"))
    val cis = perReplicate
      .withColumn("_r", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .groupBy(col("grp"))
      .agg(
        max(when(col("_r") === ceil(lit(loPct) * col("_cnt")), col("est")))
          .as("ci_lo"),
        max(when(col("_r") === ceil(lit(hiPct) * col("_cnt")), col("est")))
          .as("ci_hi"),
        count(lit(1)).as("b"))
    val meanSum =
      if (integerValued) sum(col("v").cast("long")).cast("double")
      else dsum(col("v"))
    val means = df.select(col(groupCol).as("grp"), col(valueCol).as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), (meanSum / count(lit(1))).as("mean"))
    means.join(cis, "grp")
      .select(col("grp"), col("n"), col("mean"), col("ci_lo"),
        col("ci_hi"), col("b"))
  }

  /** DuckDB mirror of [[meanCi]] (`fastHash` mirrors the xxhash64
    * draw via [[multiplicityFastSql]]). */
  def meanCiSql(srcSql: String, groupSql: String, valueSql: String,
      idSql: String, b: Int = 100, loPct: Double = 0.025,
      hiPct: Double = 0.975, integerValued: Boolean = false,
      fastHash: Boolean = false): String = {
    val repSum =
      if (integerValued) "CAST(CAST(SUM(CAST(v AS BIGINT) * m) AS BIGINT) AS DOUBLE)"
      else dsumSql("v * m")
    val meanSum =
      if (integerValued) s"CAST(CAST(SUM(CAST($valueSql AS BIGINT)) AS BIGINT) AS DOUBLE)"
      else dsumSql(valueSql)
    val wmCtes =
      if (fastHash) {
        // x must expose h = u64(id) for the staged pipeline
        val (text, _) = multiplicityFastCtes("x")
        text
      } else
        s""",
           |wm AS (
           |  SELECT grp, v, b, ${multiplicitySql("id")} AS m FROM x)""".stripMargin
    val xH = if (fastHash) s", ${graft.util.DuckHash.u64(idSql)} AS h" else ""
    s"""WITH src AS ($srcSql),
       |x AS (
       |  SELECT $groupSql AS grp, $valueSql AS v, $idSql AS id, b$xH
       |  FROM src, (SELECT unnest(generate_series(0, ${b - 1})) AS b) reps)$wmCtes,
       |per_rep AS (
       |  SELECT grp, b,
       |    CASE WHEN SUM(m) > 0
       |      THEN $repSum / CAST(SUM(m) AS BIGINT) END AS est
       |  FROM wm GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY est, b) AS r,
       |    COUNT(*) OVER (PARTITION BY grp) AS cnt
       |  FROM per_rep WHERE est IS NOT NULL),
       |cis AS (
       |  SELECT grp,
       |    MAX(CASE WHEN r = CAST(ceil(CAST($loPct AS DOUBLE) * cnt) AS BIGINT) THEN est END) AS ci_lo,
       |    MAX(CASE WHEN r = CAST(ceil(CAST($hiPct AS DOUBLE) * cnt) AS BIGINT) THEN est END) AS ci_hi,
       |    COUNT(*) AS b
       |  FROM ranked GROUP BY 1),
       |means AS (
       |  SELECT $groupSql AS grp, COUNT(*) AS n,
       |    $meanSum / COUNT(*) AS mean
       |  FROM src GROUP BY 1)
       |SELECT means.grp, n, mean, ci_lo, ci_hi, cis.b
       |FROM means JOIN cis ON means.grp = cis.grp""".stripMargin
  }
}
