package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew profiling — the diagnostic a 100 TB shuffle plan needs
  * BEFORE it runs: how concentrated is a prospective join/group key?
  * Per key column: row count, distinct keys, the hottest key and its
  * share, and the Gini coefficient of the key-frequency distribution
  * (0 = uniform, →1 = one key owns everything). A share ≫ 1/buckets
  * or Gini near 1 says "salt this key" (ops.SkewOps) before the job,
  * not after the straggler.
  *
  * Scale shape: one shuffle builds the (key, cnt) frequency table
  * (map-side combined — corpus rows never shuffle); everything after
  * runs on the VOCAB. The ascending rank the Gini formula needs comes
  * from [[GlobalRank.withGlobalRank]] — the bucketed distributed rank,
  * NOT a single-partition window — so even a 10⁹-key vocabulary never
  * funnels through one task. The hottest key rides max_by on the same
  * aggregate, no extra pass.
  *
  * Exactness: Gini via the rank formula
  * `(2·Σ(i·fᵢ) − (n+1)·Σf) / (n·Σf)` with frequencies ranked
  * ascending — all-BIGINT until one final double division, and
  * invariant to how equal frequencies are tie-broken (swapping equal
  * fᵢ leaves Σ(i·fᵢ) unchanged), so the oracle hash-matches
  * bit-for-bit.
  */
object KeySkew {

  /** One profile row for `keyCol` of `df`: (col_name, n_rows, n_keys,
    * top_key, top_share, gini). Null keys count as a key (they funnel
    * into one reducer too). */
  def profile(df: DataFrame, keyCol: String): DataFrame = {
    val freq = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    // distributed vocab rank; ties broken on key for determinism
    // (Gini is tie-order invariant, the rank window just needs a total
    // order). GlobalRank's rank is identical to the single-partition
    // row_number over (cnt, k) — proven by the o_global_rank gate —
    // so the oracle stays hash-exact.
    val ranked = GlobalRank.withGlobalRank(freq, "cnt", "k", rankCol = "i")
    ranked.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max_by(col("k"), struct(col("cnt"), col("k"))).as("top_key"),
        max(col("cnt")).as("max_cnt"),
        sum(col("i") * col("cnt")).as("iw"))
      .select(
        lit(keyCol).as("col_name"),
        col("n_rows"), col("n_keys"), col("top_key"),
        (col("max_cnt").cast("double") / col("n_rows").cast("double"))
          .as("top_share"),
        ((lit(2L) * col("iw") - (col("n_keys") + lit(1L)) * col("n_rows"))
          .cast("double")
          / (col("n_keys") * col("n_rows")).cast("double")).as("gini"))
  }

  /** DuckDB mirror of [[profile]] for one column. top_key via the
    * descending rank window (max_by on a (cnt, k) struct ≡ rn 1 when
    * ordered cnt DESC, k DESC — same total order, proven tie-break
    * pattern from the w5 gate). */
  def profileSql(srcSql: String, keyCol: String): String =
    s"""SELECT '$keyCol' AS col_name,
       |  CAST(sum(cnt) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_keys,
       |  max(CASE WHEN rd = 1 THEN k END) AS top_key,
       |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_share,
       |  CAST(2 * sum(i * cnt) - (count(*) + 1) * sum(cnt) AS DOUBLE)
       |    / CAST(count(*) * sum(cnt) AS DOUBLE) AS gini
       |FROM (
       |  SELECT k, cnt,
       |    row_number() OVER (ORDER BY cnt, k) AS i,
       |    row_number() OVER (ORDER BY cnt DESC, k DESC) AS rd
       |  FROM (
       |    SELECT CAST($keyCol AS VARCHAR) AS k,
       |      CAST(count(*) AS BIGINT) AS cnt
       |    FROM ($srcSql) src GROUP BY 1) f) r""".stripMargin
}
