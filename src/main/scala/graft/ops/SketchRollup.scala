package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-aggregated distinct-count rollups via persistable HLL sketches
  * (Spark's built-in DataSketches HllSketch functions) — the
  * incremental-aggregation architecture every 100 TB metrics pipeline
  * converges on: each ingest batch writes one SKETCH row per
  * partition (a few KB), and any later rollup — per week, per year,
  * global — is a register-max UNION of stored sketches, never a
  * rescan of the raw data.
  *
  * The load-bearing property: HLL register updates are per-item
  * maxima, so a union of disjoint slices' sketches carries the same
  * information as one global pass — the merged estimate stays within
  * the single sketch's error class (no error compounding with the
  * number of merges, unlike e.g. averaging per-slice percentiles).
  * It is NOT bit-identical to the single-pass estimate: the
  * DataSketches union gadget may hold a different target
  * representation and re-estimate from it (measured: 1488 vs 1492 on
  * 1500 true distincts). SketchRollupSpec anchors merged-vs-direct
  * within a fraction of the configured RSE and both vs exact counts.
  */
object SketchRollup {

  /** One HLL sketch of `keyCol` per `partCol` value (+ exact row
    * count). This is the table a pipeline PERSISTS per batch. */
  def partialSketches(df: DataFrame, partCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(partCol))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Per-part estimates off the stored sketches — no raw-data scan. */
  def estimates(partials: DataFrame, partCol: String): DataFrame =
    partials.select(col(partCol),
      hll_sketch_estimate(col("sketch")).as("est_distinct"),
      col("n_rows"))
      .orderBy(col(partCol))

  /** Cross-part rollup: union the stored sketches, estimate once. */
  def unionEstimate(partials: DataFrame): DataFrame =
    partials.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("est_distinct_total"),
      sum(col("n_rows")).as("n_rows_total"))
}
