package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, distributed sampling — the reference's row-cap
  * patterns (SURVEY §4: 200k-row tail cap, head-10k plot subset,
  * stride 5) without `limit`'s single-partition funnel or `sample`'s
  * seed-per-partition nondeterminism.
  */
object Sampling {

  /** Keep ~pct% of rows, chosen by a stable hash of the key columns:
    * the same row is always in or out, across runs, engines, and
    * repartitionings — the property that makes train/eval splits
    * reproducible at 100 TB. */
  def hashSample(df: DataFrame, pct: Double, keys: Seq[String]): DataFrame = {
    require(pct >= 0 && pct <= 100)
    val bucket = pmod(xxhash64(keys.map(col): _*), lit(10000L))
    df.filter(bucket < lit((pct * 100).toLong))
  }

  /** Every Nth row per group in a given order (the stride-5 serving
    * subsample — F1_web_dashboard_app.py:471). */
  def stride(df: DataFrame, n: Int, partitionBy: Seq[String],
      orderBy: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy(orderBy.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter((col("_rn") % n) === 0)
      .drop("_rn")
  }

  /** Deterministic cap: the first `n` rows per group by the given
    * order (the 200k-row training cap — train_by_circuit.py:160-162),
    * computed distributively via row_number, not a driver-side limit. */
  def groupCap(df: DataFrame, n: Int, partitionBy: Seq[String],
      orderBy: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }
}
