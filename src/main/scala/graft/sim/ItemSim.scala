package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item similarity from co-occurrence — the bipartite-projection
  * recommender ("bought X, also bought Y"): project the (basket, item)
  * bipartite graph onto items, score each co-occurring pair by cosine
  * over basket incidence n_ab / √(n_a·n_b), keep top-k per item.
  *
  * Scale shape: the classic pair-explosion guard is a HARD BASKET CAP
  * — a basket of b items emits b(b−1)/2 pairs, so one 10⁶-item bot
  * basket emits 5·10¹¹ pairs; baskets above `maxBasket` are DROPPED
  * (deterministic, mirrored in the oracle) before the self-join. After
  * the cap the pair count is ≤ corpusRows·maxBasket/2 — linear. The
  * per-item top-k window partitions by item (never global).
  *
  * Exactness: counts are longs; cosine is one long multiply, one IEEE
  * sqrt, one divide — all correctly-rounded, bit-identical cross-
  * engine; rank ties break on the partner id.
  */
object ItemSim {

  /** @param baskets (basketCol, itemCol) rows, duplicates allowed
    * @return (item, other, n_pair, cosine, rank) — top-`k` partners
    *         per item by cosine desc, partner id asc. */
  def topkCosine(baskets: DataFrame, basketCol: String, itemCol: String,
      k: Int, maxBasket: Int): DataFrame = {
    // the capped basket-item frame feeds item counts AND both sides of
    // the pair self-join — materialize once (bounded: ≤ corpus rows of
    // two keys) instead of re-running scan+distinct per consumer; the
    // alias renames below defeat ReuseExchange's canonicalization
    val kept = cappedBasketItems(baskets, basketCol, itemCol, maxBasket)
    val itemN = kept.groupBy(col("_i")).agg(count(lit(1)).as("_n"))
    val pairs = kept.as("l")
      .join(kept.as("r"), expr("l._b = r._b AND l._i < r._i"))
      .groupBy(col("l._i").as("_a"), col("r._i").as("_c"))
      .agg(count(lit(1)).as("n_pair"))
    val scored = pairs
      .join(itemN.withColumnRenamed("_i", "_a").withColumnRenamed("_n", "_na"),
        Seq("_a"))
      .join(itemN.withColumnRenamed("_i", "_c").withColumnRenamed("_n", "_nc"),
        Seq("_c"))
      .withColumn("cosine",
        col("n_pair").cast("double") /
          sqrt((col("_na") * col("_nc")).cast("double")))
    // symmetric: each pair serves both endpoints' top-k lists. explode,
    // not union — a union of two projections would duplicate the whole
    // pair-join lineage into two plan branches and execute it twice
    val both = scored.select(explode(array(
        struct(col("_a").as("item"), col("_c").as("other"),
          col("n_pair"), col("cosine")),
        struct(col("_c").as("item"), col("_a").as("other"),
          col("n_pair"), col("cosine")))).as("_e"))
      .select(col("_e.item").as("item"), col("_e.other").as("other"),
        col("_e.n_pair").as("n_pair"), col("_e.cosine").as("cosine"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("other"))
    both.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Distinct (basket, item) rows of baskets with ≤ `maxBasket` items,
    * eagerly materialized: every caller fans this frame into ≥ 3 plan
    * branches whose alias renames block exchange reuse. */
  private def cappedBasketItems(baskets: DataFrame, basketCol: String,
      itemCol: String, maxBasket: Int): DataFrame = {
    val b = baskets.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    b.join(
      b.groupBy(col("_b")).agg(count(lit(1)).as("_bsz"))
        .filter(col("_bsz") <= maxBasket).select(col("_b")),
      Seq("_b"))
      .localCheckpoint(true)
  }

  /** DuckDB mirror of [[topkCosine]]. */
  def topkCosineSql(srcSql: String, basketSql: String, itemSql: String,
      k: Int, maxBasket: Int): String =
    s"""WITH b AS (
       |  SELECT DISTINCT $basketSql AS bk, $itemSql AS it
       |  FROM ($srcSql) raw),
       |kept AS (
       |  SELECT * FROM b WHERE bk IN (
       |    SELECT bk FROM b GROUP BY bk HAVING COUNT(*) <= $maxBasket)),
       |item_n AS (SELECT it, COUNT(*) AS n FROM kept GROUP BY 1),
       |pairs AS (
       |  SELECT l.it AS a, r.it AS c, CAST(COUNT(*) AS BIGINT) AS n_pair
       |  FROM kept l JOIN kept r ON l.bk = r.bk AND l.it < r.it
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT a, c, n_pair,
       |    CAST(n_pair AS DOUBLE) /
       |      sqrt(CAST(na.n * nc.n AS DOUBLE)) AS cosine
       |  FROM pairs JOIN item_n na ON a = na.it JOIN item_n nc ON c = nc.it),
       |both_dir AS (
       |  SELECT a AS item, c AS other, n_pair, cosine FROM scored
       |  UNION ALL
       |  SELECT c AS item, a AS other, n_pair, cosine FROM scored)
       |SELECT item, other, n_pair, cosine, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY item
       |    ORDER BY cosine DESC, other) AS INT) AS rank
       |  FROM both_dir) t
       |WHERE rank <= $k""".stripMargin

  /** Pairwise association rules (market-basket a→b): support,
    * confidence, and lift from the SAME capped co-occurrence counts as
    * [[topkCosine]] — the interpretable face of the recommender
    * ("X implies Y with lift 3.2"), emitted in BOTH directions since
    * confidence is asymmetric.
    *
    * Exactness: support = c_ab/N, confidence = c_ab/c_a, lift =
    * c_ab·N/(c_a·c_b) — each one IEEE divide of long products.
    * Scale: identical to topkCosine (basket cap bounds the
    * pair explosion); the rule filter (minPairCount) prunes before the
    * count joins. */
  def associationRules(baskets: DataFrame, basketCol: String,
      itemCol: String, minPairCount: Long, maxBasket: Int): DataFrame = {
    val kept = cappedBasketItems(baskets, basketCol, itemCol, maxBasket)
    val totals = kept.select(countDistinct(col("_b")).as("_N"))
    val itemN = kept.groupBy(col("_i")).agg(count(lit(1)).as("_n"))
    val pairs = kept.as("l")
      .join(kept.as("r"), expr("l._b = r._b AND l._i < r._i"))
      .groupBy(col("l._i").as("_a"), col("r._i").as("_c"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    val scored = pairs
      .join(itemN.withColumnRenamed("_i", "_a").withColumnRenamed("_n", "_na"),
        Seq("_a"))
      .join(itemN.withColumnRenamed("_i", "_c").withColumnRenamed("_n", "_nc"),
        Seq("_c"))
      .crossJoin(broadcast(totals))
    // both directions via explode (confidence is asymmetric) — a union
    // of two projections would execute the pair-join lineage twice
    val dir = scored.select(explode(array(
        struct(col("_a").as("antecedent"), col("_c").as("consequent"),
          col("n_pair"), col("_na").as("_nl"), col("_nc").as("_nr"),
          col("_N")),
        struct(col("_c").as("antecedent"), col("_a").as("consequent"),
          col("n_pair"), col("_nc").as("_nl"), col("_na").as("_nr"),
          col("_N")))).as("_e"))
      .select(col("_e.antecedent").as("antecedent"),
        col("_e.consequent").as("consequent"),
        col("_e.n_pair").as("n_pair"), col("_e._nl").as("_nl"),
        col("_e._nr").as("_nr"), col("_e._N").as("_N"))
    dir
      .withColumn("support",
        col("n_pair").cast("double") / col("_N").cast("double"))
      .withColumn("confidence",
        col("n_pair").cast("double") / col("_nl").cast("double"))
      .withColumn("lift",
        (col("n_pair") * col("_N")).cast("double") /
          (col("_nl") * col("_nr")).cast("double"))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("support"), col("confidence"), col("lift"))
  }

  /** DuckDB mirror of [[associationRules]]. */
  def associationRulesSql(srcSql: String, basketSql: String,
      itemSql: String, minPairCount: Long, maxBasket: Int): String =
    s"""WITH b AS (
       |  SELECT DISTINCT $basketSql AS bk, $itemSql AS it
       |  FROM ($srcSql) raw),
       |kept AS (
       |  SELECT * FROM b WHERE bk IN (
       |    SELECT bk FROM b GROUP BY bk HAVING COUNT(*) <= $maxBasket)),
       |totals AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS nb FROM kept),
       |item_n AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY 1),
       |pairs AS (
       |  SELECT l.it AS a, r.it AS c, CAST(COUNT(*) AS BIGINT) AS n_pair
       |  FROM kept l JOIN kept r ON l.bk = r.bk AND l.it < r.it
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $minPairCount),
       |scored AS (
       |  SELECT a, c, n_pair, na.n AS nl, nc.n AS nr, t.nb
       |  FROM pairs JOIN item_n na ON a = na.it
       |    JOIN item_n nc ON c = nc.it, totals t),
       |dir AS (
       |  SELECT a AS antecedent, c AS consequent, n_pair, nl, nr, nb
       |  FROM scored
       |  UNION ALL
       |  SELECT c AS antecedent, a AS consequent, n_pair, nr AS nl,
       |    nl AS nr, nb
       |  FROM scored)
       |SELECT antecedent, consequent, n_pair,
       |  CAST(n_pair AS DOUBLE) / CAST(nb AS DOUBLE) AS support,
       |  CAST(n_pair AS DOUBLE) / CAST(nl AS DOUBLE) AS confidence,
       |  CAST(n_pair * nb AS DOUBLE) / CAST(nl * nr AS DOUBLE) AS lift
       |FROM dir""".stripMargin
}
