package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed quantile (median) regression by pinball-loss
  * subgradient descent (Koenker & Bassett 1978) — the robust-fit
  * twin of [[LogregGd]]: same sufficient-statistics plan shape (the
  * weight row broadcasts to the scan, the gradient returns as ONE
  * d+1-column aggregate), but fitting the conditional MEDIAN, which
  * a training-data pipeline wants wherever heavy tails would wreck
  * least squares (doc lengths, latencies, prices).
  *
  * Exactness contract (why the trained model is oracle-hash-exact):
  * the pinball subgradient depends on the residual only through its
  * SIGN, and with integer targets yq = y·Q and integer weights wq
  * (units 1/Q) the residual sign is an integer comparison —
  * sign(y·Q − Σ wq_j·x_j). The subgradient choice at r = 0 is pinned
  * to the negative branch (documented; measure-zero for real data but
  * the determinism must not depend on that). For τ = 1/2 the update is
  *
  *   G_j  = Σ_rows s_i·x_ij          s_i = IF(rq_i > 0, 1, −1) (BIGINT)
  *   wq'  = wq_j + ((etaQ div t)·G_j) div (2·n)               (BIGINT)
  *
  * with the classic 1/t subgradient step schedule (fixed steps
  * oscillate; the schedule is what makes a 5-8 step budget land near
  * the median) — integer `div`s only, identical in both engines. No
  * floats anywhere in the training loop.
  */
object QuantileReg {

  /** Weight quantization: wq is in units of 1/Q. */
  val Q = 1000000L

  /** Train median regression on (y, x0..x3) — y double (quantized
    * internally), xj integer longs — for `iters` subgradient steps
    * with integer step scale `etaQ` (quantized units per mean
    * gradient). Returns melted (feature_idx, w_q), the LogregGd gate
    * shape. */
  def train(xy: DataFrame, iters: Int = 5, etaQ: Long = Q): DataFrame = {
    val feats = Seq("x0", "x1", "x2", "x3")
    // Materialize the quantized projection ONCE: every one of the
    // `iters` gradient stages references it, and without the
    // checkpoint each stage's lineage re-runs the source scan +
    // quantization (measured 8 parquet scans in one plan at iters=8).
    // Only (yq, x0..x3) survive the projection — 5 longs per row.
    val quant = xy.withColumn("yq",
      floor(col("y") * lit(Q.toDouble)).cast("long"))
      .select(col("yq") +: feats.map(col): _*)
      .localCheckpoint(true)
    var w = quant.agg(count(lit(1)).as("n"))
      .select(col("n") +: feats.map(f => lit(0L).as(s"w_$f")): _*)
      // truncate the 1-row weight lineage each step (LogregGd/TextRank
      // pattern): iteration i otherwise re-embeds every prior
      // iteration's aggregate — quadratic total passes.
      .localCheckpoint(true)
    for (t <- 1 to iters) {
      val scored = quant.crossJoin(broadcast(w))
        .withColumn("_rq",
          col("yq") - feats.map(f => col(s"w_$f") * col(f)).reduce(_ + _))
        .withColumn("_s", when(col("_rq") > 0, 1L).otherwise(-1L))
      w = scored.groupBy(col("n") +: feats.map(f => col(s"w_$f")): _*)
        .agg(sum(col("_s") * col(feats.head)).as(s"g_${feats.head}"),
          feats.tail.map(f => sum(col("_s") * col(f)).as(s"g_$f")): _*)
        .select(col("n") +: feats.map(f =>
          (col(s"w_$f") +
            expr(s"(${etaQ / t}) * g_$f div (2 * n)")).as(s"w_$f")): _*)
        .localCheckpoint(true)
    }
    // w exits the loop already checkpointed (every iteration truncates
    // its lineage above), so the four melt arms each read a 1-row
    // in-memory leaf — no further pin needed.
    val melted = feats.zipWithIndex.map { case (f, j) =>
      w.select(lit(j).as("feature_idx"), col(s"w_$f").as("w_q"))
    }
    melted.reduce(_.union(_)).orderBy("feature_idx")
  }

  /** DuckDB mirror: identical quantization, sign rule, and integer
    * update, unrolled one CTE pair per iteration. `srcSql` must yield
    * (y, x0..x3). */
  def trainSql(srcSql: String, iters: Int = 5, etaQ: Long = Q): String = {
    val feats = Seq("x0", "x1", "x2", "x3")
    val init =
      s"""w0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  ${feats.map(f => s"CAST(0 AS BIGINT) AS w_$f").mkString(", ")}
         |  FROM x)""".stripMargin
    val steps = (1 to iters).map { i =>
      val pred = feats.map(f => s"w.w_$f * x.$f").mkString(" + ")
      s"""z$i AS (
         |  SELECT w.n, ${feats.map(f => s"w.w_$f").mkString(", ")},
         |    ${feats.map(f => s"x.$f").mkString(", ")},
         |    CASE WHEN x.yq - ($pred) > 0 THEN 1 ELSE -1 END AS s
         |  FROM x, w${i - 1} w),
         |w$i AS (
         |  SELECT n, ${feats.map(f =>
             s"CAST(w_$f + ${etaQ / i} * SUM(s * $f) // (2 * n) AS BIGINT) AS w_$f")
             .mkString(", ")}
         |  FROM z$i GROUP BY n, ${feats.map(f => s"w_$f").mkString(", ")})"""
        .stripMargin
    }
    val out = feats.zipWithIndex.map { case (f, j) =>
      s"SELECT $j AS feature_idx, w_$f AS w_q FROM w$iters"
    }.mkString("\nUNION ALL\n")
    s"""WITH x AS (
       |  SELECT CAST(floor(y * $Q.0) AS BIGINT) AS yq,
       |    ${feats.mkString(", ")}
       |  FROM ($srcSql) src),
       |$init,
       |${steps.mkString(",\n")}
       |$out
       |ORDER BY feature_idx""".stripMargin
  }
}
