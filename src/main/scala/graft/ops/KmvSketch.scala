package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.DuckHash

/** KMV (k-minimum-values / bottom-k) distinct sketch with SET-ALGEBRA
  * estimation — the third graft-kernel sketch (after [[HllKernel]]
  * and [[HdrHistogram]]) and the one HLL cannot replace: two groups'
  * bottom-k sets support INTERSECTION / Jaccard estimation (Beyer et
  * al., "On synopses for distinct-value estimation under multiset
  * operations"), the primitive behind "how many users/documents do
  * these two shards share" at 100 TB without a distinct-join.
  *
  * Construction, all integer and oracle-exact:
  *  - value hash = the engine's xxhash64 (u64 spelled in DuckDB by
  *    [[DuckHash]]); ordering is SIGNED long order, i.e. uniform u64
  *    order of g = h XOR 2^63 — a bijection of a uniform variable is
  *    uniform, and the estimator reads g's order statistic as
  *    (signed h_(k)) + 2^63 in decimal(38,0)/HUGEINT;
  *  - per-group sketch = k smallest distinct hashes (bounded
  *    [[graft.functions.MinKAgg]] aggregation, map-side combined;
  *    merge of shard sketches ≡ rebuild BIT-identically);
  *  - distinct estimate: d < k → the sketch is the complete hash set,
  *    estimate is EXACT; d ≥ k → (k−1)·2^64/g_(k) in e6 units, one
  *    integral division;
  *  - intersection: re-sketch the UNION of the two bottom-k sets
  *    (k smallest of S_A ∪ S_B — computable from sketches alone),
  *    count members present in both, then
  *    est_∩ = matches·est_∪/|U| — with a non-full union sketch this
  *    degenerates to the exact count, so ONE formula serves both
  *    regimes on both engines.
  */
object KmvSketch {

  val K = 256 // RSE ≈ 1/√(k−1) ≈ 6.3%
  private val HalfStr = "9223372036854775808" // 2^63
  /** (K−1)·2^64·1e6 — estimator numerator (decimal(38,0)/HUGEINT). */
  val EstNumE6: BigInt = BigInt(K - 1) * (BigInt(1) << 64) * 1000000L

  /** Spark-SQL estimate expr: exact d·1e6 below k, order-statistic
    * estimator at k. `d` long expr, `hk` the kth smallest SIGNED hash. */
  private def estExpr(d: String, hk: String): String =
    s"CASE WHEN $d >= $K THEN CAST('$EstNumE6' AS DECIMAL(38,0)) div " +
      s"(CAST($hk AS DECIMAL(38,0)) + CAST('$HalfStr' AS DECIMAL(38,0))) " +
      s"ELSE CAST($d AS BIGINT) * 1000000L END"

  /** DuckDB twin of [[estExpr]]. */
  private def estSql(d: String, hk: String): String =
    s"CASE WHEN $d >= $K THEN CAST(CAST('$EstNumE6' AS HUGEINT) // " +
      s"(($hk)::HUGEINT + CAST('$HalfStr' AS HUGEINT)) AS BIGINT) " +
      s"ELSE CAST($d AS BIGINT) * 1000000 END"

  /** Per-group KMV sketches of `keyCol` (sorted ascending arrays). */
  def sketches(df: DataFrame, grpCol: String, keyCol: String): DataFrame =
    // NO distinct() pre-pass: MinKAgg dedups inside its bounded buffer
    // (SketchKernelPropSpec), so the only shuffle carries ≤ k values
    // per group per task — a distinct() here would shuffle the FULL
    // per-group key set, the cost the sketch exists to avoid
    df.filter(col(keyCol).isNotNull)
      .select(col(grpCol).as("grp"), xxhash64(col(keyCol)).as("h"))
      .groupBy(col("grp"))
      .agg(graft.functions.MinKAgg.minK(K)(col("h")).as("sk"))

  /** One-row set-algebra report for groups `grpA` vs `grpB`:
    * per-group distinct estimates, union / intersection / DIFFERENCE
    * estimates, Jaccard, and both CONTAINMENT directions (all e6),
    * plus the exact intersection count for reference.
    *
    * Difference and containment read off the SAME union re-sketch
    * (r12 verdict item 4 — "how much of shard B is already inside
    * shard A", the question a 100 TB ingest asks before paying for a
    * merge): among the union sketch's members, `only_a` sit in A
    * only, so est(A∖B) = only_a·est_∪/|U|, and containment
    * |A∩B|/|A| = matches/(matches+only_a) — the standard bottom-k
    * member-fraction estimators, which degenerate to EXACT values
    * when the union sketch isn't full, same as the intersection.
    *
    * Degenerate inputs (r12 ADVICE): if a group is absent its d/hk/est
    * columns are NULL (the estimator CASE propagates them), and every
    * ratio column is guarded by its denominator — empty input yields
    * NULL estimators, never a division error (ANSI-safe). */
  def intersectEstimate(df: DataFrame, grpCol: String, keyCol: String,
      grpA: String, grpB: String): DataFrame = {
    val base = df.filter(col(grpCol).isin(grpA, grpB))
    // the 2-row sketch frame feeds BOTH the per-group pivot and the
    // union re-sketch — pin it so the scan→distinct→sketch lineage
    // runs once (scan census: events 3 → 2)
    val sk = sketches(base, grpCol, keyCol)
      .select(col("grp"), col("sk"),
        size(col("sk")).cast("long").as("d_sk"),
        element_at(col("sk"), -1).as("h_k")) // = kth smallest iff full
      .localCheckpoint(true)
    val perGroup = sk.groupBy()
      .agg(
        max(when(col("grp") === grpA, col("d_sk"))).as("d_a"),
        max(when(col("grp") === grpA, col("h_k"))).as("hk_a"),
        max(when(col("grp") === grpB, col("d_sk"))).as("d_b"),
        max(when(col("grp") === grpB, col("h_k"))).as("hk_b"))
      .withColumn("est_a_e6", expr(estExpr("d_a", "hk_a")))
      .withColumn("est_b_e6", expr(estExpr("d_b", "hk_b")))
    // union sketch from the two sketches alone (≤ 2K rows, then ≤ K):
    // dimension-sized by construction, so the global rank rides the
    // pmod constant-partition trick (the apportion-budget pattern)
    val union = sk.select(col("grp"), explode(col("sk")).as("h"))
      .groupBy(col("h"))
      .agg(max(when(col("grp") === grpA, 1).otherwise(0)).as("in_a"),
        max(when(col("grp") === grpB, 1).otherwise(0)).as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(pmod(col("h"), lit(1))).orderBy(col("h"))))
      .filter(col("rn") <= K)
      .agg(count(lit(1)).as("n_u"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("matches"),
        sum(when(col("in_a") === 1 && col("in_b") === 0, 1L).otherwise(0L))
          .as("only_a"),
        sum(when(col("in_a") === 0 && col("in_b") === 1, 1L).otherwise(0L))
          .as("only_b"),
        max(col("h")).as("h_u"))
    val exact = base.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(when(col(grpCol) === grpA, 1).otherwise(0)).as("ia"),
        max(when(col(grpCol) === grpB, 1).otherwise(0)).as("ib"))
      .filter(col("ia") === 1 && col("ib") === 1)
      .agg(count(lit(1)).as("n_inter_exact"))
    perGroup.crossJoin(broadcast(union)).crossJoin(broadcast(exact))
      .withColumn("est_union_e6", expr(estExpr("n_u", "h_u")))
      .select(lit(K.toLong).as("k_cfg"),
        col("d_a"), col("d_b"), col("matches"),
        col("only_a"), col("only_b"),
        col("est_a_e6"), col("est_b_e6"), col("est_union_e6"),
        // multiply in decimal: matches·est_union_e6 can pass 2^63 at
        // extreme union cardinality, and matches ≤ n_u keeps the
        // QUOTIENT long-safe — so only the intermediate needs width.
        // Every divisor is guarded (CASE is lazy on both engines):
        // n_u = 0 on empty input, matches+only_a = 0 when the union
        // sketch holds no A-members.
        when(col("n_u") > 0,
          expr("CAST(matches AS DECIMAL(38,0)) * est_union_e6 div n_u"))
          .as("est_inter_e6"),
        when(col("n_u") > 0,
          expr("CAST(only_a AS DECIMAL(38,0)) * est_union_e6 div n_u"))
          .as("est_diff_ab_e6"),
        when(col("n_u") > 0,
          expr("CAST(only_b AS DECIMAL(38,0)) * est_union_e6 div n_u"))
          .as("est_diff_ba_e6"),
        when(col("n_u") > 0, expr("matches * 1000000L div n_u"))
          .as("jaccard_e6"),
        when(col("matches") + col("only_a") > 0,
          expr("matches * 1000000L div (matches + only_a)"))
          .as("cont_a_e6"),
        when(col("matches") + col("only_b") > 0,
          expr("matches * 1000000L div (matches + only_b)"))
          .as("cont_b_e6"),
        col("n_inter_exact"))
  }

  /** The PAIRWISE generalization — the dataset-composition audit
    * shape ("how much do my domain shards overlap, pairwise"): one
    * row per unordered group pair with union / intersection /
    * difference / Jaccard / containment estimates, all from the G
    * per-group sketches alone
    * (≤ G·k hash values total; every join below is equi over the
    * sketch-sized frames except the G² pair enumeration, a ≤G-row
    * nested-loop scalar the lint allowlist bounds). The exact
    * intersection witness rides a (key, grp)-distinct self-join —
    * the cost a sketch deployment drops, kept here as the gate's
    * error column. Same estimator spelling as [[intersectEstimate]],
    * same exact-degeneration for non-full union sketches. */
  def pairwiseMatrix(df: DataFrame, grpCol: String,
      keyCol: String): DataFrame = {
    val sk = sketches(df, grpCol, keyCol).localCheckpoint(true)
    val ex = sk.select(col("grp"), explode(col("sk")).as("h"))
      .localCheckpoint(true)
    val pairs = sk.select(col("grp").as("g1"))
      .crossJoin(sk.select(col("grp").as("g2")))
      .filter(col("g1") < col("g2"))
    val contrib = pairs.join(ex, col("g1") === col("grp"))
      .select(col("g1"), col("g2"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .union(pairs.join(ex, col("g2") === col("grp"))
        .select(col("g1"), col("g2"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")))
      .groupBy(col("g1"), col("g2"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val perPair = contrib
      .withColumn("rn", row_number().over(
        Window.partitionBy("g1", "g2").orderBy("h")))
      .filter(col("rn") <= K)
      .groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_u"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("matches"),
        sum(when(col("in_a") === 1 && col("in_b") === 0, 1L).otherwise(0L))
          .as("only_a"),
        sum(when(col("in_a") === 0 && col("in_b") === 1, 1L).otherwise(0L))
          .as("only_b"),
        max(col("h")).as("h_u"))
      .withColumn("est_union_e6", expr(estExpr("n_u", "h_u")))
    // exact witness in ONE scan and ONE key shuffle: each key's sorted
    // group set expands to its ≤G²/2 pairs in-row (a self-join of the
    // (key, grp) distinct frame would scan the source twice and risk
    // corpus² at scale)
    val exact = df.filter(col(keyCol).isNotNull)
      .select(col(grpCol).as("g"), col(keyCol).as("u"))
      .groupBy(col("u"))
      .agg(sort_array(collect_set(col("g"))).as("gs"))
      .select(explode(expr(
        "flatten(transform(gs, (a, i) -> transform(slice(gs, i + 2, size(gs)), " +
          "b -> named_struct('g1', a, 'g2', b))))")).as("p"))
      .groupBy(col("p.g1").as("g1"), col("p.g2").as("g2"))
      .agg(count(lit(1)).as("n_inter_exact"))
    perPair.join(exact, Seq("g1", "g2"), "left")
      .select(col("g1"), col("g2"), col("n_u"), col("matches"),
        col("only_a"), col("only_b"), col("est_union_e6"),
        expr("CAST(matches AS DECIMAL(38,0)) * est_union_e6 div n_u")
          .as("est_inter_e6"),
        // difference + containment off the same union sketch (see
        // intersectEstimate); n_u ≥ 1 here (pairs exist only for
        // non-empty sketches) but the member-count denominators can
        // be 0 when one side contributes nothing below the union's
        // kth hash — guarded, NULL on that degenerate pair
        expr("CAST(only_a AS DECIMAL(38,0)) * est_union_e6 div n_u")
          .as("est_diff_ab_e6"),
        expr("CAST(only_b AS DECIMAL(38,0)) * est_union_e6 div n_u")
          .as("est_diff_ba_e6"),
        expr("matches * 1000000L div n_u").as("jaccard_e6"),
        when(col("matches") + col("only_a") > 0,
          expr("matches * 1000000L div (matches + only_a)"))
          .as("cont_a_e6"),
        when(col("matches") + col("only_b") > 0,
          expr("matches * 1000000L div (matches + only_b)"))
          .as("cont_b_e6"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"))
  }

  /** DuckDB mirror of [[pairwiseMatrix]]. */
  def pairwiseMatrixSql(from: String = "events",
      grpExpr: String = "event_type", keyExpr: String = "user_id"): String = {
    import DuckHash._
    val (hashCtes, lastHash) = stagedCtes("kmsrc", Seq("grp"),
      xxhash64LongStages("42::HUGEINT"), "kmh")
    s"""WITH kmsrc AS (
       |  SELECT $grpExpr AS grp, ${u64(keyExpr)} AS h
       |  FROM $from WHERE $keyExpr IS NOT NULL)$hashCtes,
       |kmd AS (SELECT DISTINCT grp, ${toSigned("h")} AS hs FROM $lastHash),
       |kmrk AS (SELECT grp, hs,
       |  row_number() OVER (PARTITION BY grp ORDER BY hs) AS rn FROM kmd),
       |kmsk AS (SELECT grp, hs FROM kmrk WHERE rn <= $K),
       |kmpairs AS (SELECT a.grp AS g1, b.grp AS g2
       |  FROM (SELECT DISTINCT grp FROM kmsk) a
       |  JOIN (SELECT DISTINCT grp FROM kmsk) b ON a.grp < b.grp),
       |kmc AS (
       |  SELECT p.g1, p.g2, s.hs,
       |    MAX(CASE WHEN s.grp = p.g1 THEN 1 ELSE 0 END) AS in_a,
       |    MAX(CASE WHEN s.grp = p.g2 THEN 1 ELSE 0 END) AS in_b
       |  FROM kmpairs p JOIN kmsk s ON s.grp = p.g1 OR s.grp = p.g2
       |  GROUP BY 1, 2, 3),
       |kmur AS (SELECT g1, g2, hs, in_a, in_b,
       |  row_number() OVER (PARTITION BY g1, g2 ORDER BY hs) AS rn FROM kmc),
       |kmua AS (SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS n_u,
       |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS matches,
       |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS only_a,
       |  CAST(SUM(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS only_b,
       |  MAX(hs) AS h_u
       |  FROM kmur WHERE rn <= $K GROUP BY 1, 2),
       |kmud AS (SELECT DISTINCT $grpExpr AS g, $keyExpr AS u FROM $from
       |  WHERE $keyExpr IS NOT NULL),
       |kmex AS (SELECT a.g AS g1, b.g AS g2,
       |  CAST(COUNT(*) AS BIGINT) AS n_inter_exact
       |  FROM kmud a JOIN kmud b ON a.u = b.u AND a.g < b.g GROUP BY 1, 2)
       |SELECT u.g1, u.g2, u.n_u, u.matches, u.only_a, u.only_b,
       |  ${estSql("u.n_u", "u.h_u")} AS est_union_e6,
       |  CAST((u.matches::HUGEINT * ${estSql("u.n_u", "u.h_u")}) // u.n_u
       |       AS BIGINT) AS est_inter_e6,
       |  CAST((u.only_a::HUGEINT * ${estSql("u.n_u", "u.h_u")}) // u.n_u
       |       AS BIGINT) AS est_diff_ab_e6,
       |  CAST((u.only_b::HUGEINT * ${estSql("u.n_u", "u.h_u")}) // u.n_u
       |       AS BIGINT) AS est_diff_ba_e6,
       |  CAST((u.matches * 1000000) // u.n_u AS BIGINT) AS jaccard_e6,
       |  CASE WHEN u.matches + u.only_a > 0 THEN CAST((u.matches * 1000000)
       |       // (u.matches + u.only_a) AS BIGINT) END AS cont_a_e6,
       |  CASE WHEN u.matches + u.only_b > 0 THEN CAST((u.matches * 1000000)
       |       // (u.matches + u.only_b) AS BIGINT) END AS cont_b_e6,
       |  COALESCE(e.n_inter_exact, 0) AS n_inter_exact
       |FROM kmua u LEFT JOIN kmex e ON e.g1 = u.g1 AND e.g2 = u.g2""".stripMargin
  }

  /** DuckDB mirror of [[intersectEstimate]]. */
  def intersectEstimateSql(from: String = "events",
      grpExpr: String = "event_type", keyExpr: String = "user_id",
      grpA: String = "view", grpB: String = "click"): String = {
    import DuckHash._
    val (hashCtes, lastHash) = stagedCtes("kmvsrc", Seq("grp"),
      xxhash64LongStages("42::HUGEINT"), "kmvh")
    s"""WITH kmvsrc AS (
       |  SELECT $grpExpr AS grp, ${u64(keyExpr)} AS h
       |  FROM $from WHERE $grpExpr IN ('$grpA', '$grpB')
       |    AND $keyExpr IS NOT NULL)$hashCtes,
       |kmvd AS (SELECT DISTINCT grp, ${toSigned("h")} AS hs FROM $lastHash),
       |kmvrk AS (SELECT grp, hs,
       |  row_number() OVER (PARTITION BY grp ORDER BY hs) AS rn FROM kmvd),
       |kmvsk AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS d_sk,
       |  MAX(CASE WHEN rn = $K THEN hs END) AS h_k
       |  FROM kmvrk WHERE rn <= $K GROUP BY 1),
       |kmvpg AS (SELECT
       |  MAX(CASE WHEN grp = '$grpA' THEN d_sk END) AS d_a,
       |  MAX(CASE WHEN grp = '$grpA' THEN h_k END) AS hk_a,
       |  MAX(CASE WHEN grp = '$grpB' THEN d_sk END) AS d_b,
       |  MAX(CASE WHEN grp = '$grpB' THEN h_k END) AS hk_b
       |  FROM kmvsk),
       |kmvux AS (SELECT hs,
       |  MAX(CASE WHEN grp = '$grpA' THEN 1 ELSE 0 END) AS in_a,
       |  MAX(CASE WHEN grp = '$grpB' THEN 1 ELSE 0 END) AS in_b
       |  FROM kmvrk WHERE rn <= $K GROUP BY 1),
       |kmvur AS (SELECT hs, in_a, in_b,
       |  row_number() OVER (ORDER BY hs) AS rn FROM kmvux),
       |kmvua AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_u,
       |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS matches,
       |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS only_a,
       |  CAST(SUM(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS only_b,
       |  MAX(hs) AS h_u
       |  FROM kmvur WHERE rn <= $K),
       |kmvex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_inter_exact FROM (
       |  SELECT $keyExpr FROM $from
       |  WHERE $grpExpr IN ('$grpA', '$grpB') AND $keyExpr IS NOT NULL
       |  GROUP BY 1
       |  HAVING MAX(CASE WHEN $grpExpr = '$grpA' THEN 1 ELSE 0 END) = 1
       |     AND MAX(CASE WHEN $grpExpr = '$grpB' THEN 1 ELSE 0 END) = 1))
       |SELECT CAST($K AS BIGINT) AS k_cfg, d_a, d_b, matches,
       |  only_a, only_b,
       |  ${estSql("d_a", "hk_a")} AS est_a_e6,
       |  ${estSql("d_b", "hk_b")} AS est_b_e6,
       |  ${estSql("n_u", "h_u")} AS est_union_e6,
       |  CASE WHEN n_u > 0 THEN
       |    CAST((matches::HUGEINT * ${estSql("n_u", "h_u")}) // n_u AS BIGINT)
       |  END AS est_inter_e6,
       |  CASE WHEN n_u > 0 THEN
       |    CAST((only_a::HUGEINT * ${estSql("n_u", "h_u")}) // n_u AS BIGINT)
       |  END AS est_diff_ab_e6,
       |  CASE WHEN n_u > 0 THEN
       |    CAST((only_b::HUGEINT * ${estSql("n_u", "h_u")}) // n_u AS BIGINT)
       |  END AS est_diff_ba_e6,
       |  CASE WHEN n_u > 0 THEN
       |    CAST((matches * 1000000) // n_u AS BIGINT) END AS jaccard_e6,
       |  CASE WHEN matches + only_a > 0 THEN CAST((matches * 1000000)
       |       // (matches + only_a) AS BIGINT) END AS cont_a_e6,
       |  CASE WHEN matches + only_b > 0 THEN CAST((matches * 1000000)
       |       // (matches + only_b) AS BIGINT) END AS cont_b_e6,
       |  n_inter_exact
       |FROM kmvpg, kmvua, kmvex""".stripMargin
  }
}
