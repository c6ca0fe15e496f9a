package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) — the near-linear community finder for large graphs, and the
  * natural next step after the pairwise ops this engine already gates
  * (near-dup pairs, item co-occurrence): communities group RELATED
  * items, where connected components (the dedup primitive) would
  * merge everything reachable. Determinism (the gate contract): the
  * classic algorithm breaks mode ties randomly; here ties break
  * (count desc, label asc) via a min-of-struct, and updates are
  * SYNCHRONOUS over a FIXED iteration count — same move that made
  * TextRank's PageRank oracle-able.
  *
  * Scale shape: per iteration ONE join of the edge list against the
  * label table (both keyed on vertex) and two keyed aggregates — the
  * corpus/graph never moves through a driver or a global window;
  * labels are checkpointed per round (the DedupClusters precedent) so
  * round N doesn't replay rounds 1..N-1.
  */
object LabelPropagation {

  /** @param edges undirected (u, v) pairs, u < v.
    * @return (vertex, community, community_size) — community = the
    *         converged-upon label (min-id biased via the tiebreak). */
  def communities(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    // Round 1 folded into the init (r15, the DedupClusters move): with
    // identity starting labels, joining the label table is a no-op —
    // neighbor v's label IS v — so round 1 is the (u, v) multiplicity
    // count + mode tiebreak straight off the edge list: one join and
    // the init-distinct shuffle gone. Every vertex of the symmetric
    // list appears as u, so coverage is identical.
    var labels = sym
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
      .groupBy(col("u"))
      .agg(min(struct((-col("c")).as("nc"), col("v").as("l"))).as("m"))
      .select(col("u").as("vertex"), col("m.l").as("label"))
      .localCheckpoint(true)
    for (_ <- 2 to iters) {
      labels = sym
        .join(labels.select(col("vertex").as("v"), col("label").as("nl")), "v")
        .groupBy(col("u"), col("nl")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(min(struct((-col("c")).as("nc"), col("nl").as("l"))).as("m"))
        .select(col("u").as("vertex"), col("m.l").as("label"))
        .localCheckpoint(true)
    }
    val sizes = labels.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("community_size"))
    labels.select(col("vertex"), col("label").as("community"))
      .join(sizes, "community")
      .select(col("vertex"), col("community"), col("community_size"))
  }

  /** Item co-purchase communities: edges = part pairs sharing ≥
    * `minPairCount` orders, baskets capped at `maxBasket` items (the
    * association-rules pair algebra — bounded quadratic per basket). */
  def itemCommunities(lineitem: DataFrame, minPairCount: Long = 2L,
      maxBasket: Int = 5, iters: Int = 3): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("bid"), col("l_partkey").as("item"))
      .distinct()
    val small = items.groupBy(col("bid")).agg(count(lit(1)).as("bs"))
      .filter(col("bs") <= maxBasket).select("bid")
    // both sides of the pair self-join read this frame; materialize
    // once (the ItemSim cappedBasketItems move — alias renames would
    // otherwise defeat ReuseExchange and run scan+distinct twice)
    val inB = items.join(small, "bid").localCheckpoint(true)
    val edges = inB.as("a")
      .join(inB.as("b"),
        col("a.bid") === col("b.bid") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("u"), col("b.item").as("v"))
      .agg(count(lit(1)).as("pc"))
      .filter(col("pc") >= minPairCount)
      .select("u", "v")
    communities(edges, iters)
  }

  /** DuckDB mirror: same edges, the sync rounds unrolled as chained
    * CTEs with the identical (count desc, label asc) mode tiebreak. */
  def itemCommunitiesSql(srcSql: String, minPairCount: Long = 2L,
      maxBasket: Int = 5, iters: Int = 3): String = {
    def step(i: Int): String =
      s"""l$i AS (
         |  SELECT u AS vertex, nl AS label FROM (
         |    SELECT u, nl,
         |      row_number() OVER (PARTITION BY u ORDER BY c DESC, nl) AS rn
         |    FROM (
         |      SELECT e.u, l.label AS nl, count(*) AS c
         |      FROM sym e JOIN l${i - 1} l ON e.v = l.vertex
         |      GROUP BY 1, 2) t) r
         |  WHERE rn = 1)""".stripMargin
    s"""WITH src AS ($srcSql),
       |items AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item FROM src),
       |small AS (SELECT bid FROM items GROUP BY 1
       |          HAVING count(*) <= $maxBasket),
       |inb AS (SELECT i.* FROM items i JOIN small USING (bid)),
       |edges AS (
       |  SELECT a.item AS u, b.item AS v
       |  FROM inb a JOIN inb b ON a.bid = b.bid AND a.item < b.item
       |  GROUP BY 1, 2 HAVING count(*) >= $minPairCount),
       |sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
       |l0 AS (SELECT DISTINCT u AS vertex, u AS label FROM sym),
       |${(1 to iters).map(step).mkString(",\n")}
       |SELECT l.vertex, l.label AS community,
       |  s.community_size
       |FROM l$iters l
       |JOIN (SELECT label AS community, CAST(count(*) AS BIGINT)
       |        AS community_size
       |      FROM l$iters GROUP BY 1) s ON l.label = s.community""".stripMargin
  }
}
