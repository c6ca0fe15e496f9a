package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maximal-Marginal-Relevance diversified retrieval (Carbonell &
  * Goldstein 1998): greedily pick k results maximizing
  * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the standard RAG
  * re-rank that stops five near-identical passages from filling the
  * context window when one of them plus four diverse ones is worth
  * more.
  *
  * Scale shape: relevance scoring + top-`poolSize` pooling is the
  * distributed pass (identical plan to the brute-force kNN gate —
  * broadcast query side, one corpus scan, per-query window top-k);
  * the greedy loop then runs DRIVER-SIDE over the collected pool —
  * a queries × poolSize artifact bounded by parameters, never corpus
  * rows (the kmeans-seed / BPE-merge-table precedent). A DataFrame
  * loop here would replan a growing union each of the k rounds
  * (measured 3.9 s of pure scheduling at sf0.1 vs ~0.5 s for the
  * pooling pass itself); the greedy math is poolSize·k comparisons
  * per query — microseconds.
  *
  * Oracle exactness: rel and pairwise sims round to 6 dp (the vec_dot
  * ≡ list_dot_product currency of the kNN gates); each iteration's
  * MMR objective is one fixed double expression over those rounded
  * inputs, re-rounded to 6 dp, with neighbor_id as the total
  * tie-break; the DuckDB mirror unrolls the same k iterations as
  * chained CTEs (the BPE-oracle pattern).
  */
object Mmr {

  /** Diversified top-k per query (vec_id < numQueries are queries):
    * (query_id, mmr_rank, neighbor_id, rel). */
  def mmrTopK(emb: DataFrame, numQueries: Int = 3, poolSize: Int = 12,
      k: Int = 5, lambda: Double = 0.7): DataFrame = {
    graft.functions.VecDotFloat.register(emb.sparkSession)
    val q = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    val pool = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("rel", round(expr(Knn.dotExpr), 6))
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") <= poolSize)
      .select(col("query_id"), col("neighbor_id"), col("rel"), col("ne"))
      .localCheckpoint(true) // pooled once; k iterations re-read it
    val sims = pool.select(col("query_id"), col("neighbor_id").as("a"),
        col("ne").as("ae"))
      .join(pool.select(col("query_id"), col("neighbor_id").as("b"),
        col("ne").as("be")), Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        round(expr("vec_dot(ae, be)"), 6).as("sim"))
      .localCheckpoint(true)
    // bounded artifacts off the distributed pass
    val poolRows = pool.select(col("query_id"), col("neighbor_id"), col("rel"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val simMap = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
      .toMap

    // Spark round()'s exact semantics, for parity with the SQL mirror
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    val spark = emb.sparkSession
    import spark.implicits._
    poolRows.groupBy(_._1).toSeq.flatMap { case (qid, cands) =>
      val rel = cands.map(c => c._2 -> c._3).toMap
      var remaining = cands.map(_._2).toSet
      var selected = Vector.empty[Long]
      while (selected.length < k && remaining.nonEmpty) {
        val pick =
          if (selected.isEmpty)
            remaining.toSeq.maxBy(id => (rel(id), -id))
          else
            remaining.toSeq.maxBy { id =>
              val maxsim = selected.map(s => simMap((qid, id, s))).max
              (r6(lambda * rel(id) - (1.0 - lambda) * maxsim), -id)
            }
        selected = selected :+ pick
        remaining -= pick
      }
      selected.zipWithIndex.map { case (id, i) => (qid, id, rel(id), i + 1) }
    }.toDF("query_id", "neighbor_id", "rel", "mmr_rank")
  }

  /** DuckDB mirror of [[mmrTopK]]: same pool, same sims, k unrolled
    * greedy iterations as chained CTEs. */
  def mmrTopKSql(numQueries: Int = 3, poolSize: Int = 12, k: Int = 5,
      lambda: Double = 0.7): String = {
    val lam = lambda; val oneMinus = 1.0 - lambda
    val iterations = (2 to k).map { i =>
      s""",
         |ms$i AS (
         |  SELECT si.query_id, si.a AS neighbor_id, MAX(si.sim) AS maxsim
         |  FROM sims si JOIN sel${i - 1} sp
         |    ON sp.query_id = si.query_id AND sp.neighbor_id = si.b
         |  GROUP BY 1, 2),
         |s$i AS (
         |  SELECT query_id, neighbor_id, rel, $i AS mmr_rank FROM (
         |    SELECT p.query_id, p.neighbor_id, p.rel,
         |      ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
         |        ROUND(CAST($lam AS DOUBLE) * p.rel - CAST($oneMinus AS DOUBLE) * m.maxsim, 6) DESC,
         |        p.neighbor_id) AS rn
         |    FROM pool p
         |    JOIN ms$i m ON m.query_id = p.query_id
         |      AND m.neighbor_id = p.neighbor_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
         |      WHERE x.query_id = p.query_id
         |        AND x.neighbor_id = p.neighbor_id)) t
         |  WHERE rn = 1),
         |sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)""".stripMargin
    }.mkString
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |           FROM embeddings WHERE vec_id < $numQueries),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne
       |      FROM embeddings),
       |pool AS (
       |  SELECT query_id, neighbor_id, rel, ne FROM (
       |    SELECT query_id, neighbor_id,
       |      ROUND(list_dot_product(qe, ne), 6) AS rel, ne,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY ROUND(list_dot_product(qe, ne), 6) DESC, neighbor_id) AS rn
       |    FROM q, c WHERE query_id <> neighbor_id) t
       |  WHERE rn <= $poolSize),
       |sims AS (
       |  SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
       |    ROUND(list_dot_product(p1.ne, p2.ne), 6) AS sim
       |  FROM pool p1 JOIN pool p2 ON p1.query_id = p2.query_id
       |    AND p1.neighbor_id <> p2.neighbor_id),
       |sel1 AS (
       |  SELECT query_id, neighbor_id, rel, 1 AS mmr_rank FROM (
       |    SELECT query_id, neighbor_id, rel,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY rel DESC, neighbor_id) AS rn
       |    FROM pool) t
       |  WHERE rn = 1)$iterations
       |SELECT query_id, neighbor_id, rel, mmr_rank FROM sel$k""".stripMargin
  }
}
