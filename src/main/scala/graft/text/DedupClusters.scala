package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERS from near-duplicate PAIRS: the step a real
  * training-data pipeline needs after any pair generator (ngram /
  * minhash / embedding) — transitive grouping plus one canonical doc
  * per group (min doc_id), so "drop all but the canonical" is a join.
  *
  * Connected components via iterative min-label propagation over the
  * undirected edge list: each round every vertex takes the minimum of
  * its own label and its neighbors' labels; convergence in
  * O(component diameter) rounds. Near-dup components are tiny dense
  * clusters, so 3-4 rounds is typical; `maxIters` bounds pathological
  * chains and the loop exits early on a converged round (checked with
  * a cheap changed-count). Every round is two shuffles on the vertex
  * id (join + min-agg) over the EDGE LIST ONLY — corpus size never
  * enters; `localCheckpoint` truncates the growing lineage so round N
  * doesn't replay rounds 1..N-1. This is the plain-DataFrame form of
  * the large-star/small-star CC algorithm's contraction idea.
  */
object DedupClusters {

  /** @param pairs (doc_a, doc_b) undirected near-dup pairs, a < b.
    * @return (doc_id, cluster_id, is_canonical, cluster_size) — one
    *         row per doc that has at least one near-dup edge;
    *         cluster_id = min doc_id reachable, canonical = that doc. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint(true)
    // Round 1 folded into the init: with identity starting labels the
    // first propagation is just min(own id, min neighbor id), which is
    // one aggregation over the edge list — no join, no extra
    // checkpoint/convergence-count cycle. (Every vertex has ≥1 edge,
    // so grouping the symmetric edge list by u covers all vertices.)
    var labels = edges.groupBy(col("u").as("doc_id"))
      .agg(min(col("v")).as("nbr_min"))
      .select(col("doc_id"),
        least(col("doc_id"), col("nbr_min")).as("label"))
      .localCheckpoint(true)
    var iter = 1
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("v"), col("label").as("vlabel")), "v")
        .groupBy(col("u").as("doc_id"))
        .agg(min(col("vlabel")).as("nbr_min"))
      // the convergence flag rides along in the same projection — no
      // extra join against the previous labels
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label")).as("chg"))
        .localCheckpoint(true)
      val changed = next.filter(col("chg")).limit(1).count()
      labels = next.select(col("doc_id"), col("label"))
      converged = changed == 0
      iter += 1
    }
    val sizes = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.select(col("doc_id"), col("label").as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("is_canonical"),
        col("cluster_size"))
  }

  /** Clusters straight from documents: exact n-gram Jaccard pairs at
    * `threshold` → connected components. `maxShingleDF > 0` caps
    * stop-shingles in the pair generation (the scale path — see
    * [[Shingles.exactJaccardPairs]]); sizes stay exact, so on a corpus
    * whose true near-dups share only rare shingles the clusters are
    * identical to the uncapped form. */
  def fromDocuments(docs: DataFrame, threshold: Double,
      maxShingleDF: Long = 0L): DataFrame =
    connectedComponents(
      Shingles.exactJaccardPairs(docs, threshold, maxShingleDF)
        .select("doc_a", "doc_b"))

  /** The recursive CTE chain up to the label table `lab(doc_id,
    * cluster_id)` — shared by [[clustersSql]] and the corpus-pipeline
    * oracle. `maxShingleDF > 0` mirrors the capped pair generation
    * (common counts from rare shingles only, sizes exact). */
  def labCtes(threshold: Double, maxShingleDF: Long = 0L): String = {
    val pairSource =
      if (maxShingleDF > 0)
        s"""rare AS (SELECT shingle FROM sh GROUP BY shingle
           |         HAVING COUNT(*) <= $maxShingleDF),
           |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
           |jp AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
           |  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),""".stripMargin
      else
        """jp AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
          |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),""".stripMargin
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id,
       |    words[CAST(i AS INT)] || ' ' || words[CAST(i AS INT)+1] || ' ' || words[CAST(i AS INT)+2] AS shingle
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t,
       |  LATERAL (SELECT unnest(generate_series(1, len(words)-2)) AS i) s
       |  WHERE len(words) >= 3),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
       |$pairSource
       |good AS (
       |  SELECT doc_a, doc_b FROM jp
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= $threshold),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM good
       |          UNION SELECT doc_b, doc_a FROM good),
       |reach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t0
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |lab AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY 1)""".stripMargin
  }

  /** END-TO-END canonicalization — the step a production dedup run
    * actually ships: pairs → components → drop every non-canonical
    * member → per-language retention rollup (docs and chars kept vs
    * total), i.e. the "what did dedup cost each language" report every
    * corpus release publishes. Unclustered docs (no near-dup edge) are
    * kept by definition (left join, kept = coalesce(is_canonical,
    * true)). One extra broadcast-sized join over [[fromDocuments]] —
    * the cluster frame is bounded by near-dup density, not corpus
    * size. */
  def canonicalRetention(docs: DataFrame, threshold: Double,
      maxShingleDF: Long = 0L): DataFrame = {
    val clusters = fromDocuments(docs, threshold, maxShingleDF)
      .select(col("doc_id"), col("is_canonical"))
    docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("is_canonical"), lit(true)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept").cast("long")).as("kept_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(when(col("kept"), col("n_chars")).otherwise(lit(0L)))
          .as("kept_chars"))
  }

  /** DuckDB mirror of [[canonicalRetention]]. */
  def canonicalRetentionSql(threshold: Double,
      maxShingleDF: Long = 0L): String =
    s"""${labCtes(threshold, maxShingleDF)},
       |flags AS (
       |  SELECT d.lang, d.n_chars,
       |    COALESCE(l.doc_id = l.cluster_id, TRUE) AS kept
       |  FROM documents d LEFT JOIN lab l USING (doc_id))
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS kept_chars
       |FROM flags GROUP BY 1""".stripMargin

  /** DuckDB mirror: same jaccard pairs, transitive closure via a
    * recursive CTE, min reachable id as the cluster label. */
  def clustersSql(threshold: Double, maxShingleDF: Long = 0L): String =
    s"""${labCtes(threshold, maxShingleDF)}
       |SELECT doc_id, cluster_id, (doc_id = cluster_id) AS is_canonical,
       |  cs.cluster_size
       |FROM lab
       |JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1) cs
       |USING (cluster_id)""".stripMargin
}
