package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S2 dimension upsert (the reference's update_one(upsert=True) per
  * (year, round) — F1_Data_Collect.ipynb:113-117) without a
  * transactional table format: updates win per key, existing rows
  * without an update survive. In a Delta/Iceberg deployment this maps
  * 1:1 to MERGE INTO; here the merged frame is rewritten atomically
  * (write temp + swap is the deployment concern, out of engine scope).
  */
object Dims {

  /** Merge `updates` into `existing` by `keys`: an updated key takes
    * ALL its non-key column values from `updates`. */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = existing.columns.filterNot(keys.contains)
    val e = existing.as("e")
    val u = updates.as("u")
    e.join(u, keys, "full_outer")
      .select(keys.map(col) ++ valueCols.map { c =>
        coalesce(col(s"u.$c"), col(s"e.$c")).as(c)
      }: _*)
  }
}
