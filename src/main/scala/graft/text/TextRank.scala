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
  * Scores are iterated floats whose parallel summation order is not
  * deterministic cross-engine, so the gate entry is rows-only; the
  * spec anchors a hand graph against exactly computed values and the
  * corpus run against the mass-conservation invariant.
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
    var pr = wdeg.select(col("u").as("v"), lit(1.0 / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(wdeg, "u")
        .join(pr.select(col("v").as("u"), col("pr")), "u")
        .select(col("v"), (col("pr") * col("w") / col("wdeg")).as("c"))
        .groupBy("v").agg(sum(col("c")).as("inflow"))
      pr = wdeg.select(col("u").as("v"))
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    pr.orderBy(desc("pr"), col("v")).limit(k)
      .select(col("v").as("word"), col("pr").as("score"))
  }
}
