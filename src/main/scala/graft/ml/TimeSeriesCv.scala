package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Purged expanding-window time-series cross-validation folds — the
  * split discipline for any model trained on temporal data (forecast
  * eval, drift-robust quality models): each fold tests on one calendar
  * quarter and trains on everything STRICTLY before that quarter minus
  * an embargo gap, so label leakage through temporally adjacent rows
  * (López de Prado 2018, ch. 7 "purged k-fold") is structurally
  * impossible. Expanding (not sliding) train windows: the standard
  * walk-forward protocol.
  *
  * Scale shape at 100 TB: the corpus is touched ONCE by a per-day count
  * aggregate (map-combinable, output bounded by distinct days, i.e. a
  * dimension-sized frame); folds derive from the same day frame, and
  * train/test counts are day-frame × fold-frame joins — broadcast-sized
  * both sides, corpus row count never re-enters. Assigning fold
  * MEMBERSHIP to rows (for an actual training job) is then a stateless
  * date comparison against the broadcast fold table, no shuffle.
  */
object TimeSeriesCv {

  /** Per-fold summary: (fold_id, q_start, q_end, n_train, n_test) with
    * fold_id = year·10 + quarter of the test window. Folds whose
    * embargo-purged train window is empty report n_train = 0 (callers
    * drop them; kept here so the fold table is total and deterministic). */
  def quarterlyFolds(orders: DataFrame, dateCol: String = "o_orderdate",
      embargoDays: Int = 30): DataFrame = {
    // day-bounded (and quarter-bounded) frames, each referenced three
    // times below — pinned so "the corpus is touched once" holds in
    // the physical plan too (scan-censused 5 source scans without)
    val byDay = orders.select(to_date(col(dateCol)).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val folds = byDay.select(date_trunc("quarter", col("d")).cast("date").as("q_start"))
      .distinct()
      .select(
        (year(col("q_start")) * 10 + quarter(col("q_start"))).cast("long").as("fold_id"),
        col("q_start"),
        date_sub(add_months(col("q_start"), 3), 1).as("q_end"),
        date_sub(col("q_start"), embargoDays).as("cutoff"))
      .localCheckpoint(true)
    val nTest = byDay.join(broadcast(folds),
        col("d") >= col("q_start") && col("d") <= col("q_end"))
      .groupBy("fold_id").agg(sum(col("n")).as("n_test"))
    val nTrain = byDay.join(broadcast(folds), col("d") < col("cutoff"))
      .groupBy("fold_id").agg(sum(col("n")).as("n_train"))
    folds.join(nTest, Seq("fold_id"), "left")
      .join(nTrain, Seq("fold_id"), "left")
      .select(col("fold_id"), col("q_start"), col("q_end"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_test"), lit(0L)).as("n_test"))
  }

  /** DuckDB mirror: identical quarter folds, embargo cutoff, counts. */
  def quarterlyFoldsSql(dateCol: String = "o_orderdate",
      embargoDays: Int = 30): String =
    s"""WITH byday AS (
       |  SELECT CAST($dateCol AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
       |  FROM orders GROUP BY 1),
       |folds AS (
       |  SELECT CAST(year(q_start) * 10 + quarter(q_start) AS BIGINT) AS fold_id,
       |    q_start,
       |    CAST(q_start + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS q_end,
       |    CAST(q_start - INTERVAL $embargoDays DAY AS DATE) AS cutoff
       |  FROM (SELECT DISTINCT CAST(date_trunc('quarter', d) AS DATE) AS q_start
       |        FROM byday)),
       |n_test AS (
       |  SELECT fold_id, SUM(n) AS n_test FROM byday b
       |  JOIN folds f ON b.d >= f.q_start AND b.d <= f.q_end
       |  GROUP BY 1),
       |n_train AS (
       |  SELECT fold_id, SUM(n) AS n_train FROM byday b
       |  JOIN folds f ON b.d < f.cutoff
       |  GROUP BY 1)
       |SELECT f.fold_id, f.q_start, f.q_end,
       |  CAST(COALESCE(t.n_train, 0) AS BIGINT) AS n_train,
       |  CAST(COALESCE(s.n_test, 0) AS BIGINT) AS n_test
       |FROM folds f
       |LEFT JOIN n_test s USING (fold_id)
       |LEFT JOIN n_train t USING (fold_id)""".stripMargin
}
