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

  /** Weighted sample WITHOUT replacement, deterministic — Efraimidis–
    * Spirakis A-ES: each row draws priority −ln(u)/w and the k
    * smallest win, which is provably equivalent to sequential
    * weight-proportional draws. Replaces the driver-breaking "sort by
    * random()*weight" habit: one scan + one top-k, any scale.
    *
    * u is a pseudo-uniform derived from md5(idCol) (32 hex → first 8
    * digits → (h+1)/2³², never 0), so the draw is reproducible across
    * runs, engines, and partitionings — same doctrine as
    * [[hashSample]]. The priority is rounded to 9 dp with an id
    * tiebreak, the repo's standard guard for float orderings at the
    * selection boundary. */
  def weightedSample(df: DataFrame, k: Int, idCol: String,
      weight: Column): DataFrame = {
    val h = graft.functions.Md5PrefixLong(col(idCol).cast("string"), 8)
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    df.withColumn("_es_w", weight.cast("double"))
      .filter(col("_es_w") > 0)
      .withColumn("_es_key", round(-log(u) / col("_es_w"), 9))
      // global top-k plans TakeOrderedAndProject: per-partition heads
      // merged on the driver — k rows cross the wire, never the table
      .orderBy(col("_es_key"), col(idCol))
      .limit(k)
  }
}
