package graft.ops

import org.apache.spark.sql.DataFrame

/** Incremental JOIN maintenance — the other half of the
  * materialized-view story next to [[IncrementalAgg]]: when both join
  * inputs grow by deltas, the NEW join pairs are exactly
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * so the maintained join view is old-view ∪ deltaJoin — history is
  * never re-joined against history. At 100 TB this is the difference
  * between a nightly full shuffle of two fact tables and three joins
  * whose LEFT sides are delta-sized (the old⋈old term, the only
  * quadratic-in-history one, is precisely the term never recomputed).
  *
  * Exactness is structural (bag semantics: the three terms partition
  * the new pairs by which side contributed the new row), so the gate
  * can hash-match a full-recompute oracle.
  */
object IncrementalJoin {

  /** The new join pairs contributed by the deltas (inner equi-join on
    * `keys`). Union with the previous view to maintain it. */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** Maintained view after one increment: old view ∪ delta pairs. */
  def maintain(oldView: DataFrame, aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    oldView.unionByName(deltaJoin(aOld, aDelta, bOld, bDelta, keys))
}
