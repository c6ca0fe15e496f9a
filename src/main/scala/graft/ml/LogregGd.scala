package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training by full-batch gradient
  * descent over sufficient statistics — the "train a quality
  * classifier on the corpus" primitive of a training-data pipeline
  * (fasttext-style linear scorers are trained exactly like this when
  * the corpus is too large to sample honestly).
  *
  * Scale shape at 100 TB: per iteration the weight vector (d+1 longs)
  * BROADCASTS to the scan, and the gradient comes back as ONE global
  * aggregate of d+1 partial sums — the shuffle carries d+1 numbers per
  * partition per iteration, never rows. The (y, x) projection is
  * materialized once (5 longs/row) and each iteration truncates the
  * 1-row weight lineage, so T iterations = T passes over the compact
  * frame — NOT T parquet scans, and not the quadratic recompute a
  * growing lazy lineage would plan. Zero driver-side data movement
  * beyond the weight row.
  *
  * Exactness (the cross-engine hash contract): the model activation is
  * the HARD sigmoid p = clip(z/4 + 1/2, 0, 1) — piecewise-rational, so
  * with integer features xq and integer weights wq (units 1/W) every
  * quantity stays integer-exact:
  *
  *   z_scaled = Σ wq_j·xq_j                          (BIGINT)
  *   pq       = clip(floor((z_scaled + 2W)/4), 0, W) (units 1/W; /4 is
  *              a power-of-two divide → exact in IEEE on both engines)
  *   grad_j   = Σ (pq − y·W)·xq_j                    (BIGINT, assoc.)
  *   wq'      = wq − floor(grad_j / (lrDen·n))       (one IEEE divide
  *              of bounded ints; quotient ≥ 1/(lrDen·n) away from any
  *              integer unless exact → floor is engine-identical)
  *
  * exp() never appears — libm differences are the one thing that would
  * break bit-exactness, and the hard sigmoid is the standard surrogate
  * where determinism matters more than the last decimal of calibration.
  */
object LogregGd {

  /** Weight quantization: wq is in units of 1/W. */
  val W = 1000000L

  /** Train on (y, x0..x3) — y ∈ {0,1}, xj integer-valued longs —
    * for `iters` full-batch GD steps with learning rate 1/lrDen.
    * Returns (feature_idx, w_q): the quantized weight per feature,
    * starting from w = 0. */
  def train(xy: DataFrame, iters: Int = 3, lrDen: Long = 2L): DataFrame = {
    val feats = Seq("x0", "x1", "x2", "x3")
    val w = trainWeights(xy, iters, lrDen)
    // melt the weight row to (feature_idx, w_q) for a stable gate shape
    val melted = feats.zipWithIndex.map { case (f, j) =>
      w.select(lit(j).as("feature_idx"), col(s"w_$f").as("w_q"))
    }
    melted.reduce(_.union(_)).orderBy("feature_idx")
  }

  /** The 1-row weight frame (n, w_x0..w_x3) after `iters` GD steps —
    * the composition seam: downstream scorers broadcast this row. */
  def trainWeights(xy: DataFrame, iters: Int = 3,
      lrDen: Long = 2L, materialize: Boolean = true): DataFrame = {
    val feats = Seq("x0", "x1", "x2", "x3")
    // Materialize the (y, x0..x3) projection ONCE — 5 longs per row.
    // Every iteration's aggregate passes over this frame; without the
    // checkpoint the growing weight lineage re-embeds the source scan
    // per nesting level (censused: 16 parquet scans at iters=3).
    // Callers whose input is ALREADY pinned (QualityClassifier's
    // feature frame) pass materialize = false so the same corpus-sized
    // rows aren't held on executor storage twice.
    val x0 = xy.select((col("y") +: feats.map(col)): _*)
    val x = if (materialize) x0.localCheckpoint(true) else x0
    // n rides inside the single-row weight frame so each iteration is
    // one broadcast join + one aggregate, no driver round-trip.
    var w = x.agg(count(lit(1)).as("n"))
      .select(col("n") +: feats.map(f => lit(0L).as(s"w_$f")): _*)
      // truncate the 1-row weight lineage per step (the TextRank
      // pattern): iteration i otherwise embeds every prior iteration's
      // aggregate, so total passes over the data grow quadratically.
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val z = x.crossJoin(broadcast(w))
        .withColumn("_z", feats.map(f => col(s"w_$f") * col(f))
          .reduce(_ + _))
        .withColumn("_pq",
          least(greatest(
            floor((col("_z") + lit(2L * W)) / lit(4.0)).cast("long"),
            lit(0L)), lit(W)))
        .withColumn("_e", col("_pq") - col("y") * lit(W))
      w = z.groupBy(col("n") +: feats.map(f => col(s"w_$f")): _*)
        .agg(sum(col("_e") * col(feats.head)).as(s"g_${feats.head}"),
          feats.tail.map(f => sum(col("_e") * col(f)).as(s"g_$f")): _*)
        .select(col("n") +: feats.map(f =>
          (col(s"w_$f") -
            floor(col(s"g_$f") / (lit(lrDen.toDouble) * col("n")))
              .cast("long")).as(s"w_$f")): _*)
        .localCheckpoint(true)
    }
    w
  }

  /** DuckDB mirror: identical init, activation, quantization, and
    * update, unrolled as one CTE chain per iteration. `srcSql` must
    * yield columns (y, x0, x1, x2, x3) with the same integerization
    * as the Spark side. */
  def trainSql(srcSql: String, iters: Int = 3, lrDen: Long = 2L): String = {
    val feats = Seq("x0", "x1", "x2", "x3")
    val out = feats.zipWithIndex.map { case (f, j) =>
      s"SELECT $j AS feature_idx, w_$f AS w_q FROM w$iters"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${trainCtes(srcSql, iters, lrDen)}
       |$out
       |ORDER BY feature_idx""".stripMargin
  }

  /** The CTE chain `x, w0, z1, w1, …, w<iters>` (no WITH keyword) —
    * shared by [[trainSql]] and composed gates that score with the
    * final weight row `w<iters>`. */
  def trainCtes(srcSql: String, iters: Int = 3, lrDen: Long = 2L): String = {
    val feats = Seq("x0", "x1", "x2", "x3")
    val init =
      s"""w0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  ${feats.map(f => s"CAST(0 AS BIGINT) AS w_$f").mkString(", ")}
         |  FROM x)""".stripMargin
    val steps = (1 to iters).map { i =>
      val zExpr = feats.map(f => s"w.w_$f * x.$f").mkString(" + ")
      s"""z$i AS (
         |  SELECT w.n, ${feats.map(f => s"w.w_$f").mkString(", ")},
         |    ${feats.map(f => s"x.$f").mkString(", ")},
         |    least(greatest(CAST(floor((($zExpr) + ${2L * W}) / 4.0)
         |      AS BIGINT), 0), $W) - x.y * $W AS e
         |  FROM x, w${i - 1} w),
         |w$i AS (
         |  SELECT n, ${feats.map(f =>
             s"CAST(w_$f - floor(sum(e * $f) / ($lrDen.0 * n)) AS BIGINT) AS w_$f")
             .mkString(", ")}
         |  FROM z$i GROUP BY n, ${feats.map(f => s"w_$f").mkString(", ")})"""
        .stripMargin
    }
    s"""x AS ($srcSql),
       |$init,
       |${steps.mkString(",\n")}""".stripMargin
  }
}
