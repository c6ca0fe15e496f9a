package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM changepoint/drift detector per key — the control-
  * chart primitive behind "this metric's mean shifted up": S_t =
  * max(0, S_{t−1} + (x_t − target − slack)), alert while S_t > h.
  *
  * The recurrence LOOKS sequential (the max-with-0 reset defeats a
  * plain window sum), but it has a closed prefix form: with
  * P_t = Σ_{i≤t} δ_i and P_0 = 0,  S_t = P_t − min_{0≤j≤t} P_j.
  * So two KEYED window passes — running sum, running min, sharing one
  * sort — replace per-key iteration entirely: no mapPartitions state,
  * no recursion, no skew-fragile per-key buffering; a hot key costs a
  * sorted window partition, not driver memory.
  *
  * Exactness: δ is rounded to 6 dp and accumulated as decimal(38,6)
  * (associative), so P, its running min, and S are exact rationals in
  * both engines; the alert predicate compares exact decimals.
  */
object Cusum {

  /** @param orderCol time order within key; `tieCol` makes it total
    * @param target  in-control mean of `valueCol`
    * @param slack   allowance k (drift below this is ignored)
    * @param h       decision threshold (alert while S > h)
    * @return one row per input row: (key, order, tie, value, s, alert). */
  def detect(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, valueCol: String, target: Double, slack: Double,
      h: Double): DataFrame = {
    val dec = "decimal(38,6)"
    val wCum = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val delta = round(col(valueCol) - lit(target) - lit(slack), 6).cast(dec)
    df.withColumn("_p", sum(delta).over(wCum))
      // min over {P_0 = 0, P_1..P_t} = least(0, running min of P)
      .withColumn("_pmin",
        least(lit(0).cast(dec), min(col("_p")).over(wCum)))
      .withColumn("s", (col("_p") - col("_pmin")).cast("double"))
      .withColumn("alert", (col("_p") - col("_pmin")) > lit(h).cast(dec))
      .select(col(keyCol), col(orderCol), col(tieCol), col(valueCol),
        col("s"), col("alert"))
  }

  /** DuckDB mirror of [[detect]]. */
  def detectSql(srcSql: String, keySql: String, orderSql: String,
      tieSql: String, valueSql: String, target: Double, slack: Double,
      h: Double): String =
    s"""WITH src AS ($srcSql),
       |p AS (
       |  SELECT $keySql AS k, $orderSql AS o, $tieSql AS tie,
       |    $valueSql AS v,
       |    SUM(CAST(round($valueSql - $target - $slack, 6)
       |      AS DECIMAL(38,6))) OVER (PARTITION BY $keySql
       |      ORDER BY $orderSql, $tieSql
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
       |  FROM src),
       |m AS (
       |  -- NB: DuckDB's LEAST over DECIMAL(38,6) args falls back to
       |  -- DOUBLE; the outer cast re-anchors pmin on the exact 6-dp
       |  -- grid (lossless — every operand has <=6 dp, far above the
       |  -- double conversion error) so pp - pmin stays decimal math.
       |  SELECT *, CAST(LEAST(CAST(0 AS DECIMAL(38,6)), MIN(pp) OVER (
       |    PARTITION BY k ORDER BY o, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |    AS DECIMAL(38,6)) AS pmin
       |  FROM p)
       |SELECT k, o, tie, v, CAST(pp - pmin AS DOUBLE) AS s,
       |  (pp - pmin) > CAST($h AS DECIMAL(38,6)) AS alert
       |FROM m""".stripMargin
}
