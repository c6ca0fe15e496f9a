package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic calibration via pool-adjacent-violators (PAV) — the
  * monotone fit that turns a raw score→empirical-rate curve (possibly
  * noisy, non-monotone) into the best monotone step function in L²:
  * the standard probability-calibration companion to
  * [[Eval.calibration]]'s diagnostic table (Zadrozny & Elkan 2002).
  *
  * Scale shape: the corpus collapses to (group, score-bucket) long
  * sufficient statistics in ONE aggregate (buckets are the quantized
  * score values, ≤ scale+1 per group); PAV itself is sequential but
  * runs INSIDE `flatMapGroups` over that bounded bucket list — per
  * group O(buckets) time and memory, fully parallel across groups,
  * nothing on the driver.
  *
  * Determinism: PAV pools are decided by exact long cross-products
  * (rate_i > rate_{i+1} ⇔ pos_i·n_{i+1} > pos_{i+1}·n_i — no float
  * compare), so the fit is bit-stable under any partitioning; the
  * emitted rates are one IEEE divide per pool.
  *
  * SQL oracle: PAV's merge loop has no direct SQL spelling, but its
  * VALUE does — the classic minimax characterization of weighted L²
  * isotonic regression (Robertson, Wright & Dykstra 1988, Thm 1.4.4):
  * iso(k) = max_{i≤k} min_{j≥k} (Σpos[i..j] / Σn[i..j]). With ≤B
  * buckets per group that is O(B³) interval triples — bounded (the
  * gate quantizes to ≤101 buckets), so [[calibrateSql]] enumerates
  * them from window prefix sums. Bit-exactness across engines: each
  * interval rate is ONE correctly-rounded IEEE divide of two longs,
  * and round-to-nearest is monotone, so min/max over the rounded
  * doubles equals the rounded rational minimax — which is the pooled
  * pos/n this impl emits. IsotonicSpec additionally anchors the
  * textbook pools, monotonicity, pool-mean preservation, partitioning
  * invariance, and PAV≡minimax on randomized inputs.
  */
object Isotonic {

  /** Per-group PAV fit over integer score buckets.
    * @return (grp, k, n, n_pos, raw_rate, iso_rate) one row per
    *         observed bucket, iso_rate monotone non-decreasing in k */
  def calibrate(df: DataFrame, groupCol: String, kCol: String,
      labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = df
      .groupBy(col(groupCol).cast("string").as("grp"),
        col(kCol).cast("long").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"))
      .as[(String, Long, Long, Long)]

    buckets.groupByKey(_._1)
      .flatMapGroups { (grp, it) =>
        val sorted = it.toArray.sortBy(_._2) // by bucket k — bounded
        // PAV over (n, pos) pools; stack of (startIdx, n, pos)
        val stack = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Long)]
        sorted.zipWithIndex.foreach { case ((_, _, n, pos), i) =>
          var cur = (i, n, pos)
          // merge while previous pool rate > current pool rate
          while (stack.nonEmpty &&
            stack.last._3 * cur._2 > cur._3 * stack.last._2) {
            val prev = stack.remove(stack.size - 1)
            cur = (prev._1, prev._2 + cur._2, prev._3 + cur._3)
          }
          stack.append(cur)
        }
        val iso = new Array[Double](sorted.length)
        var si = 0
        while (si < stack.size) {
          val (start, n, pos) = stack(si)
          val end = if (si + 1 < stack.size) stack(si + 1)._1 else sorted.length
          val r = pos.toDouble / n
          var j = start
          while (j < end) { iso(j) = r; j += 1 }
          si += 1
        }
        sorted.zipWithIndex.iterator.map { case ((g, k, n, pos), i) =>
          (g, k, n, pos, pos.toDouble / n, iso(i))
        }
      }
      .toDF("grp", "k", "n", "n_pos", "raw_rate", "iso_rate")
  }

  /** DuckDB oracle for [[calibrate]] via the minimax characterization
    * (see object doc). `bucketsSql` must yield one row per (grp, k)
    * with BIGINT n / pos — the same sufficient statistics the engine
    * aggregates to. O(B³) per group; intended for oracle scale only.
    */
  def calibrateSql(bucketsSql: String): String =
    s"""WITH base AS ($bucketsSql),
       |ord AS (
       |  SELECT grp, k, n, pos,
       |         ROW_NUMBER() OVER w AS r,
       |         SUM(n) OVER w AS cn,
       |         SUM(pos) OVER w AS cp
       |  FROM base
       |  WINDOW w AS (PARTITION BY grp ORDER BY k)
       |),
       |iv AS (
       |  SELECT lo.grp, lo.r AS i, hi.r AS j,
       |         CAST(hi.cp - lo.cp + lo.pos AS DOUBLE)
       |           / CAST(hi.cn - lo.cn + lo.n AS DOUBLE) AS a
       |  FROM ord lo JOIN ord hi ON lo.grp = hi.grp AND lo.r <= hi.r
       |),
       |im AS (
       |  SELECT iv.grp, iv.i, o.r AS kr, MIN(iv.a) AS m
       |  FROM iv JOIN ord o
       |    ON o.grp = iv.grp AND o.r >= iv.i AND o.r <= iv.j
       |  GROUP BY 1, 2, 3
       |),
       |iso AS (SELECT grp, kr, MAX(m) AS iso_rate FROM im GROUP BY 1, 2)
       |SELECT o.grp, o.k, o.n, o.pos AS n_pos,
       |       CAST(o.pos AS DOUBLE) / CAST(o.n AS DOUBLE) AS raw_rate,
       |       iso.iso_rate
       |FROM ord o JOIN iso ON iso.grp = o.grp AND iso.kr = o.r""".stripMargin
}
