package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row_number over a total order WITHOUT the single-partition
  * Window trap. `Window.orderBy(...)` with no partitionBy funnels the
  * entire dataset through ONE task — the canonical 100 TB job killer.
  * This op computes the identical rank distributively:
  *
  *  1. one lean pass computes global (min, max) of the order value
  *     (1-row stats, the feature-scale broadcast-back pattern);
  *  2. every row gets a RANGE BUCKET via an order-preserving map
  *     `floor((v−lo)/span·B)` — monotone in IEEE arithmetic (subtract,
  *     divide-by-positive, multiply-by-positive, floor all preserve ≤),
  *     so bucket boundaries respect the value order and equal values
  *     land in the same bucket;
  *  3. per-bucket counts (≤B rows) → exclusive prefix offsets via a
  *     window over the TINY bucket table, broadcast back;
  *  4. rank = offset + row_number within bucket ordered by (v, tie).
  *
  * Equal-width buckets trade balance for determinism: a skewed value
  * distribution concentrates rows in few buckets (raise `buckets`, or
  * pre-map v through a skew-flattening monotone transform). Sampling-
  * based range partitioning balances better but is not reproducible
  * run-to-run, which would break result hashing. `tieCol` must be
  * unique to make the order total.
  */
object GlobalRank {

  /** Append `rank_col` = global 1-based row_number ordered by
    * (`valueCol` asc, `tieCol` asc). `valueCol` must be non-null
    * numeric; `tieCol` unique.
    *
    * `materialize` (default true) pins the input once on executor
    * storage: the rank plan references it THREE times (global stats,
    * bucket counts, the final bucket window), so a lazy upstream
    * lineage — a scan, an explode, a groupBy — would otherwise
    * re-execute per reference (scan-censused 3× on every caller).
    * The cost is one copy of the input rows, which is why callers
    * should project to the lean (value, tie, carry) frame first; pass
    * `materialize = false` when the input is already materialized. */
  def withGlobalRank(input: DataFrame, valueCol: String, tieCol: String,
      rankCol: String = "rn", buckets: Int = 64,
      materialize: Boolean = true): DataFrame = {
    require(buckets > 0)
    val df = if (materialize) input.localCheckpoint(true) else input
    val v = col(valueCol).cast("double")
    val stats = df.agg(min(v).as("_lo"), max(v).as("_hi"))
    val span = col("_hi") - col("_lo")
    val rawBucket = floor((v - col("_lo")) / span * lit(buckets.toDouble))
      .cast("int")
    val bucketed = df.crossJoin(broadcast(stats)) // 1-row stats
      .withColumn("_bucket",
        when(span === 0.0, lit(0)) // all-equal degenerate: one bucket
          .otherwise(least(greatest(rawBucket, lit(0)), lit(buckets - 1))))
      .drop("_lo", "_hi")
    val offsets = bucketed.groupBy(col("_bucket")).agg(count(lit(1)).as("_c"))
      .withColumn("_offset",
        // constant-valued partition key: same single-partition execution
        // (the bucket table is ≤`buckets` rows by construction) without
        // the global-window WARN spamming every driver log tail. pmod(x,1)
        // is always 0 but NOT foldable, so Catalyst can't prune it back
        // to an empty partition spec the way it does a bare literal.
        coalesce(sum(col("_c")).over(
          Window.partitionBy(pmod(col("_bucket"), lit(1)))
            .orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bucket"), col("_offset"))
    val wBucket = Window.partitionBy(col("_bucket"))
      .orderBy(col(valueCol), col(tieCol))
    bucketed.join(broadcast(offsets), Seq("_bucket"))
      .withColumn(rankCol,
        col("_offset") + row_number().over(wBucket).cast("long"))
      .drop("_bucket", "_offset")
  }

  /** DuckDB mirror: the plain global window (the oracle CAN afford it
    * single-node — that is exactly the luxury this op re-creates
    * distributively). */
  def rankSql(srcSql: String, valueSql: String, tieSql: String,
      outCols: String, rankCol: String = "rn"): String =
    s"""SELECT $outCols,
       |  row_number() OVER (ORDER BY $valueSql, $tieSql) AS $rankCol
       |FROM ($srcSql) src""".stripMargin
}
