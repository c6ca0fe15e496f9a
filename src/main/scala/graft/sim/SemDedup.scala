package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication via k-means-bucketed cosine
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): cluster the embedding
  * corpus with k-means, then compare pairs ONLY within a cluster and
  * drop every member that is ≥ τ cosine-similar to a lower-id member.
  * The clustering is what makes semantic dedup tractable — all-pairs
  * work is bounded by the largest cluster, and k grows with the
  * corpus so cluster size stays roughly constant.
  *
  * This composes two already-gated primitives without leaving one
  * plan: [[KmeansStep.train]] (fixed-iteration, integer-quantized
  * Lloyd) and the exact quantized cosine test. Keep-policy is the
  * deterministic lowest-id variant (the released SemDeDup code keeps
  * one item per duplicate group by a fixed index order; lowest vec_id
  * is that order made engine-portable).
  *
  * Exactness: vectors are floor(x·1024) longs (the KmeansStep
  * currency), so dot products and squared norms are exact longs
  * < 2⁵³ at d = 64 — cos(a,b) ≥ τ is evaluated as
  * dot > 0 ∧ dot² ≥ (τ²·|a|²)·|b|² entirely in exact-integer-valued
  * doubles plus ONE rounded constant τ², mirrored op-for-op. No sqrt,
  * no division, no epsilon.
  *
  * Scale shape: train is the KmeansStep shape (broadcast centroids,
  * map-side argmin); assignment is one more broadcast argmin pass;
  * the pair stage is ONE shuffle on cluster_id and quadratic only
  * within clusters — exactly the SemDeDup cost model. Output is one
  * row per vector.
  */
object SemDedup {

  /** @return (vec_id, cluster_id, is_kept) — is_kept = false iff some
    *         lower-id vector in the same cluster is ≥ τ cosine-similar. */
  def dedup(emb: DataFrame, k: Int = 8, iters: Int = 2,
      tau: Double = 0.8): DataFrame = {
    require(k >= 1 && iters >= 1 && tau > 0 && tau < 1)
    graft.functions.VecDotLong.register(emb.sparkSession)
    val Q = KmeansStep.quant
    val q = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(x * $Q) AS BIGINT))").as("vq"))
    // final centroid arrays from the gated trainer, dim-sorted
    val cents = KmeansStep.train(emb, k, iters)
      .groupBy(col("cluster_id").as("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, cq))), s -> s.cq)")
        .as("cq"))
    val assigned = q.crossJoin(broadcast(cents))
      // codegen'd native kernels (VecSqDistLong/VecDotLong) in place of
      // the interpreted aggregate(zip_with(...)) folds — bit-identical
      // long sums, ~all the pair-stage CPU back
      .withColumn("dist", expr("vec_sqdist_long(vq, cq)"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"), col("vq"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cluster_id"), col("m.vq").as("vq"))
      .withColumn("nq", expr("vec_dot_long(vq, vq)"))
      // referenced three times below (pair LHS, pair RHS, output rows)
      // with a full Lloyd train upstream — materialize once instead of
      // recomputing the training lineage per reference (the
      // DedupClusters checkpoint precedent; at scale the assignment
      // table is what a production SemDeDup persists anyway)
      .localCheckpoint(true)
    val tau2 = tau * tau
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", expr("vec_dot_long(a.vq, b.vq)"))
      .filter(col("dot") > 0L &&
        col("dot").cast("double") * col("dot").cast("double") >=
          (lit(tau2) * col("a.nq").cast("double")) * col("b.nq").cast("double"))
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("_dup", lit(true))
    assigned.select(col("vec_id"), col("cluster_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(!col("_dup"), lit(true)).as("is_kept"))
  }

  /** DuckDB mirror of [[dedup]] over the `embeddings` table. */
  def dedupSql(k: Int = 8, iters: Int = 2, tau: Double = 0.8,
      dims: Int = 64): String = {
    val tau2 = tau * tau
    s"""WITH ${KmeansStep.trainCtes(k, iters, dims)},
       |cf AS (SELECT cid, cq FROM c$iters),
       |df AS (
       |  SELECT q.vec_id, c.cid,
       |    CAST(sum((q.vq[CAST(g.i AS INT)] - c.cq[CAST(g.i AS INT)]) *
       |             (q.vq[CAST(g.i AS INT)] - c.cq[CAST(g.i AS INT)]))
       |      AS BIGINT) AS dist
       |  FROM q, cf c, unnest(generate_series(1, $dims)) g(i)
       |  GROUP BY 1, 2),
       |af AS (
       |  SELECT vec_id, cid AS cluster_id FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM df) z
       |  WHERE rn = 1),
       |v AS (
       |  SELECT a.vec_id, a.cluster_id, q.vq,
       |    CAST(list_sum(list_transform(q.vq, x -> x * x)) AS BIGINT) AS nq
       |  FROM af a JOIN q USING (vec_id)),
       |pr AS (
       |  SELECT b.vec_id,
       |    CAST(sum(a.vq[CAST(g.i AS INT)] * b.vq[CAST(g.i AS INT)]) AS BIGINT) AS dot,
       |    max(a.nq) AS na, max(b.nq) AS nb
       |  FROM v a JOIN v b
       |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id,
       |    unnest(generate_series(1, $dims)) g(i)
       |  GROUP BY b.vec_id, a.vec_id),
       |dropped AS (
       |  SELECT DISTINCT vec_id FROM pr
       |  WHERE dot > 0
       |    AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) >=
       |        (CAST($tau2 AS DOUBLE) * CAST(na AS DOUBLE)) * CAST(nb AS DOUBLE))
       |SELECT v.vec_id, v.cluster_id,
       |  (d.vec_id IS NULL) AS is_kept
       |FROM v LEFT JOIN dropped d ON v.vec_id = d.vec_id""".stripMargin
  }
}
