package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction — weighted PageRank over the corpus
  * word co-occurrence graph (Mihalcea & Tarau's classic): nodes are
  * words, edges are adjacent-word co-occurrences with their counts as
  * weights, and the stationary importance score surfaces the corpus's
  * central vocabulary.
  *
  * Scale shape (the same discipline as the CC dedup clusters): the
  * graph is built once from one bigram pass; every PageRank round is
  * two shuffles over the EDGE LIST only (join source scores, sum
  * inflow per target) — corpus text never re-enters; localCheckpoint
  * truncates the iteration lineage. A FIXED iteration count (no
  * convergence probe) keeps the job graph static. The symmetric edge
  * construction guarantees every node has outgoing weight, so no
  * dangling-mass correction is needed and Σ score stays 1 within
  * float tolerance (asserted in the spec).
  *
  * Two variants share the graph build:
  *  - [[keywords]]: plain double scores. Parallel summation order makes
  *    them non-deterministic cross-engine; anchored by TextRankSpec's
  *    hand graph + mass-conservation invariant.
  *  - [[keywordsQuantized]]: the ORACLE-EXACT form. Scores live in
  *    integer 10⁻⁹ units (pr9); every per-edge contribution is
  *    floor(pr9·w/wdeg) — exact integer-valued inputs through one IEEE
  *    multiply/divide, then floor — and inflows are exact BIGINT sums
  *    (order-independent). No decimal-rounding convention is involved
  *    anywhere, so DuckDB ([[keywordsQuantizedSql]], the same ten
  *    iterations unrolled as chained CTEs) reproduces every score
  *    bit-for-bit, which is what upgraded the text_textrank gate from
  *    rows-only to a full hash oracle.
  */
object TextRank {

  /** Top-`k` corpus keywords by TextRank score. */
  def keywords(docs: DataFrame, k: Int = 20, iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val bg = docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS u, ws[i] AS v))")).as("e"))
      .select(col("e.u"), col("e.v"))
      .filter(col("u") =!= col("v"))
    val edges = bg.union(bg.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u", "v").agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint(true)
    val wdeg = edges.groupBy("u").agg(sum(col("w")).as("wdeg"))
      .localCheckpoint(true)
    val n = wdeg.count().toDouble
    // hoist the iteration-INVARIANT edges⨝wdeg join out of the loop and
    // pre-partition by the aggregation key: each round is then one
    // broadcast of the vocab-sized pr table + a shuffle-free aggregate
    val edgesW = edges.join(wdeg, "u")
      .select(col("v"), col("u"), col("w"), col("wdeg"))
      .repartition(col("v"))
      .localCheckpoint(true)
    var pr = wdeg.select(col("u").as("v"), lit(1.0 / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = edgesW
        .join(broadcast(pr.select(col("v").as("u"), col("pr"))), "u")
        .select(col("v"), (col("pr") * col("w") / col("wdeg")).as("c"))
        .groupBy("v").agg(sum(col("c")).as("inflow"))
      pr = wdeg.select(col("u").as("v"))
        .join(broadcast(contrib), Seq("v"), "left")
        .select(col("v"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    pr.orderBy(desc("pr"), col("v")).limit(k)
      .select(col("v").as("word"), col("pr").as("score"))
  }

  /** Deterministic TextRank in integer 10⁻⁹ score units — same graph,
    * same damping, same fixed iteration count as [[keywords]]; every
    * arithmetic step is either exact-integer or a single deterministic
    * IEEE double op, so the result is bit-identical in any engine. */
  def keywordsQuantized(docs: DataFrame, k: Int = 20, iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val bg = docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i-1] AS u, ws[i] AS v))")).as("e"))
      .select(col("e.u"), col("e.v"))
      .filter(col("u") =!= col("v"))
    val edges = bg.union(bg.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u", "v").agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint(true)
    val wdeg = edges.groupBy("u").agg(sum(col("w")).as("wdeg"))
      .localCheckpoint(true)
    val n = wdeg.count().toDouble
    // driver-side scalars: plain IEEE double chains, reproduced
    // verbatim by the oracle's FLOOR expressions over CAST(COUNT(*))
    val init9 = math.floor(1e9 / n).toLong
    val base9 = math.floor((1 - damping) / n * 1e9).toLong
    // iteration-invariant edges⨝wdeg hoisted + partitioned on the
    // aggregation key (see [[keywords]]); the arithmetic below is
    // UNCHANGED — only the join/partitioning shape moves
    val edgesW = edges.join(wdeg, "u")
      .select(col("v"), col("u"), col("w"), col("wdeg"))
      .repartition(col("v"))
      .localCheckpoint(true)
    var pr = wdeg.select(col("u").as("v"), lit(init9).as("pr9"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = edgesW
        .join(broadcast(pr.select(col("v").as("u"), col("pr9"))), "u")
        // pr9 ≤ 1e9 and w ≤ corpus bigram count keep the product well
        // under 2^53, so the double multiply is exact; the divide is
        // one deterministic IEEE op; floor pins the result to BIGINT
        .select(col("v"),
          floor(col("pr9").cast("double") * col("w") / col("wdeg")).as("c9"))
        .groupBy("v").agg(sum(col("c9")).as("inflow9"))
      pr = wdeg.select(col("u").as("v"))
        .join(broadcast(contrib), Seq("v"), "left")
        .select(col("v"),
          (lit(base9) +
            floor(lit(damping) * coalesce(col("inflow9"), lit(0L)).cast("double"))).as("pr9"))
        .localCheckpoint(true)
    }
    pr.orderBy(desc("pr9"), col("v")).limit(k)
      .select(col("v").as("word"), col("pr9").as("score9"),
        (col("pr9").cast("double") / lit(1e9)).as("score"))
  }

  /** DuckDB mirror of [[keywordsQuantized]]: the fixed `iters` rounds
    * unrolled as chained CTEs (no recursive-CTE aggregation needed). */
  def keywordsQuantizedSql(k: Int = 20, iters: Int = 10,
      damping: Double = 0.85): String = {
    def step(i: Int): String =
      s"""pr$i AS (
         |  SELECT d0.u AS v,
         |    CAST(FLOOR(((1.0 - $damping) / nn.n) * 1000000000.0) AS BIGINT)
         |    + CAST(FLOOR($damping * CAST(COALESCE(inf.inflow9, 0) AS DOUBLE)) AS BIGINT) AS pr9
         |  FROM wdeg d0 CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.v AS v,
         |      CAST(SUM(CAST(FLOOR(CAST(p.pr9 AS DOUBLE) * e.w / d.wdeg) AS BIGINT)) AS BIGINT) AS inflow9
         |    FROM edges e JOIN wdeg d ON e.u = d.u JOIN pr${i - 1} p ON p.v = e.u
         |    GROUP BY 1) inf ON inf.v = d0.u
         |)""".stripMargin
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |bg AS (
       |  SELECT ws[i-1] AS u, ws[i] AS v
       |  FROM (SELECT ws, unnest(generate_series(2, len(ws))) AS i FROM toks) t
       |  WHERE ws[i-1] <> ws[i]),
       |edges AS (
       |  SELECT u, v, CAST(count(*) AS DOUBLE) AS w
       |  FROM (SELECT u, v FROM bg UNION ALL SELECT v AS u, u AS v FROM bg) s
       |  GROUP BY 1, 2),
       |wdeg AS (SELECT u, SUM(w) AS wdeg FROM edges GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wdeg),
       |pr0 AS (SELECT u AS v, CAST(FLOOR(1000000000.0 / n) AS BIGINT) AS pr9
       |        FROM wdeg CROSS JOIN nn),
       |${(1 to iters).map(step).mkString(",\n")}
       |SELECT v AS word, pr9 AS score9, CAST(pr9 AS DOUBLE) / 1000000000.0 AS score
       |FROM pr$iters ORDER BY pr9 DESC, v LIMIT $k""".stripMargin
  }
}
