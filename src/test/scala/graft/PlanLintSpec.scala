package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint: every declared gate query's physical plan is swept for
  * the operators that kill 100 TB jobs — cartesian products, nested
  * -loop joins, and sort-aggregate fallbacks — with an explicit,
  * justified allowlist for the intended exceptions. This is the
  * regression net behind the COVERAGE claim "no nested-loop joins
  * outside the intended 1-row scalar broadcast": a future query (or a
  * Spark upgrade) that silently plans a cross join fails here, not in
  * a fleet postmortem.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  // The complete, justified inventory of intended nested-loop joins
  // (measured with this very test run on an empty allowlist). Each is
  // a tiny broadcast side by construction:
  private val scalarBroadcastOk: Set[String] = Set(
    "text_bm25",              // 1-row corpus stats (n_docs, avgdl)
    "text_tfidf",             // 1-row n_docs
    "pipeline_temperature_mix", // 1-row Σ√n normalizer
    "knn_cosine_topk",        // 5-row query side vs corpus scan — the
                              // definition of brute-force kNN; the
                              // blocked/IVF/PQ variants are the scale
                              // path and plan no nested loop
    "text_lm_score",          // 1-row vocabulary-size scalar
    "retrieval_rrf",          // composes text_bm25 (1-row stats) +
                              // knn_cosine_topk (1-row query side) —
                              // both already justified above; the
                              // fusion itself is an equi full-outer
                              // join of two ≤depth-row frames
    "quality_profile",        // cross of the TWO 1-row aggregate
                              // branches (basics × distincts) — the
                              // split that avoids the Expand-carried
                              // min/max trap (see Profile scaladoc)
    "knn_kmeans_step",        // k=8-row broadcast centroid table
                              // fanned against the corpus scan — the
                              // definition of Lloyd assignment (same
                              // class as knn_cosine_topk's query side)
    "text_pmi",               // 1-row n_docs scalar (the a8_global/
                              // bm25 pattern) crossed into the small
                              // pair table
    "pipeline_negative_sampling", // 1-row n_docs scalar crossed into
                              // the anchors frame (draw modulus)
    "quality_ref_integrity",  // per-relation cross of the TWO 1-row
                              // count aggregates (n_child × n_orphans)
                              // — the quality_profile pattern, ×3
                              // relations unioned
    "o_global_rank",          // 1-row global (min, max) stats broadcast
                              // back for range bucketing — the
                              // feature-scale pattern at global scope
    "ml_gains_table",         // rides GlobalRank (1-row min/max stats)
                              // + its own 1-row (N, NP) totals cross
    "o_skyline_pareto",       // 1-row global x-range stats broadcast
                              // back for the distinct-x range buckets
                              // (the GlobalRank bucketing trick)
    "text_chi2_terms",        // 1-row corpus doc count crossed into
                              // the vocab-sized contingency frame
    "ml_naive_bayes",         // ≤L-row label-totals + 1-row vocab-size
                              // crosses building the vocab×L model;
                              // 1-row train-doc total for priors
    "w_quantile_normalize",   // GlobalRank's 1-row min/max stats + its
                              // own 1-row corpus count broadcast
    "knn_kmeans_train",       // the same k=8-row broadcast centroid
                              // fan as knn_kmeans_step, once per fixed
                              // Lloyd iteration
    "ml_logreg_gd",           // 1-row quantized weight vector broadcast
                              // into the scan each GD iteration — the
                              // sufficient-statistics pattern itself
    "quality_key_skew",       // rides GlobalRank over the key vocab:
                              // its 1-row (min, max) stats broadcast
    "rec_association_rules",  // 1-row basket-count total crossed into
                              // the rule frame (support denominator —
                              // the text_bm25/ml_gains pattern)
    "text_zipf_slope",        // rides GlobalRank over the word vocab:
                              // its 1-row (min, max) stats broadcast
    "pipeline_dsir_select",   // 1-row (s_tot, t_tot) smoothing
                              // denominators crossed into the B-row
                              // bucket-distribution table (the
                              // text_bm25 pattern; B ≤ a few thousand)
    "pipeline_dsir_sample",   // same weight frame as dsir_select —
                              // the identical 1-row totals cross
    "dedup_semantic",         // k=8-row broadcast centroid fan for
                              // cluster assignment — the
                              // knn_kmeans_step pattern it composes
    "knn_int8_topk",          // 25-row quantized query side fanned
                              // against the corpus scan (the
                              // knn_cosine_topk brute-force pattern)
                              // + the 1-row per-dimension scale array
                              // broadcast into the encoder
    "text_kneser_ney",        // 1-row (N1+(·,·), Vcont) smoothing
                              // scalars crossed into the test bigram
                              // stream — the text_lm_score pattern
    "ml_timeseries_cv",       // day-frame × quarter-fold-frame theta
                              // joins: BOTH sides are dimension-sized
                              // (days, quarters), corpus rows never
                              // enter the nested loop
    "pipeline_ccnet_buckets", // 1-row LM vocab scalar (text_lm_score
                              // pattern) + GlobalRank's 1-row (min,
                              // max) stats + a 1-row corpus count for
                              // the tercile cut
    "pipeline_wordpiece_encode", // 1-row vocabulary array broadcast
                              // into the stateless greedy-fold encoder
    "pipeline_quality_classifier", // the ml_logreg_gd pattern: 1-row
                              // weight vector broadcast into the scan
                              // per GD iteration + once for scoring
    "pipeline_wordpiece_roundtrip", // the same 1-row vocabulary array
                              // broadcast as pipeline_wordpiece_encode
    "text_kl_divergence",     // 1-row corpus-token-total scalar crossed
                              // into the doc-term stream (text_bm25
                              // pattern)
    "pipeline_apportion_budget", // 1-row total + 1-row leftover crossed
                              // into the language-bounded quota frame
    "ml_quantile_regression"  // the ml_logreg_gd pattern: 1-row weight
                              // vector broadcast into the scan per
                              // subgradient step
  )

  test("no gate query plans a cartesian product or an unintended nested loop") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val cart = plan.contains("CartesianProduct")
          val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
            !scalarBroadcastOk.contains(name)
          if (cart) Some(s"$name: CartesianProduct")
          else if (bnlj) Some(s"$name: BroadcastNestedLoopJoin")
          else None
        } catch {
          case e: Throwable => Some(s"$name: plan build failed: ${e.getMessage}")
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
