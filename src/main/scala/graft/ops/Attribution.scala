package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear multi-touch attribution — the credit-SPLITTING complement of
  * the last-touch/as-of joins already in the engine: every purchase
  * divides its value equally across ALL views that preceded it within
  * the lookback window, and each view rolls up the credit it earned
  * across every purchase it touched. The ads/growth-analytics shape
  * (Shapley's cheap cousin) that pure joins cannot express because the
  * denominator is itself a per-purchase aggregate.
  *
  * Scale shape: three keyed shuffles, each on a natural key — the
  * view⋈purchase pair join on user (watermark-bounded in the streaming
  * twin), the touch count as a window on purchase_id, the credit
  * rollup on view_id. No global state, no driver materialization.
  *
  * Exactness: credit = round(value / n_touches, 6) — one IEEE divide
  * of exact operands then the proven cross-engine 6-dp grid — summed
  * with the associative decimal trick, so the oracle hash-matches. */
object Attribution {

  /** @param views     (user_id, view_id, vus) — vus epoch micros
    * @param purchases (user_id, purchase_id, pus, value)
    * @param maxLagUs  lookback window in micros
    * @return per converted view: (view_id, user_id, n_conversions,
    *         credit_total) — views touching no purchase are absent
    *         (the outer attribution join covers those). */
  def linearCredit(views: DataFrame, purchases: DataFrame,
      maxLagUs: Long): DataFrame = {
    val p = purchases.withColumnRenamed("user_id", "p_user")
    val pairs = views.join(p,
      col("user_id") === col("p_user") &&
        col("pus") >= col("vus") && col("pus") <= col("vus") + lit(maxLagUs))
    val wPurchase = Window.partitionBy(col("purchase_id"))
    pairs
      .withColumn("n_touches", count(lit(1)).over(wPurchase))
      .withColumn("credit",
        round(col("value") / col("n_touches").cast("double"), 6))
      .groupBy(col("view_id"), col("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("credit").cast("decimal(38,6)")).cast("double")
          .as("credit_total"))
  }

  /** DuckDB mirror. `vSql`/`pSql` must expose the same columns as the
    * Spark inputs. */
  def linearCreditSql(vSql: String, pSql: String, maxLagUs: Long): String =
    s"""WITH v AS ($vSql), p AS ($pSql),
       |pairs AS (
       |  SELECT v.user_id, v.view_id, p.purchase_id, p.value
       |  FROM v JOIN p ON v.user_id = p.user_id
       |    AND p.pus >= v.vus AND p.pus <= v.vus + $maxLagUs),
       |t AS (
       |  SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n_touches
       |  FROM pairs)
       |SELECT view_id, user_id,
       |  CAST(count(*) AS BIGINT) AS n_conversions,
       |  CAST(SUM(CAST(round(value / CAST(n_touches AS DOUBLE), 6)
       |    AS DECIMAL(38,6))) AS DOUBLE) AS credit_total
       |FROM t GROUP BY 1, 2""".stripMargin
}
