package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic random negative sampling — the contrastive-training
  * data op: for each anchor document, draw k pseudo-random "negative"
  * docs that are NOT near-duplicates of the anchor (a near-dup drawn
  * as a negative is a false negative that actively corrupts a
  * contrastive objective — hence the anti-join against the near-dup
  * pair set, the same capped-Jaccard pairs the dedup gates use).
  *
  * Randomness is the repo's reproducible-uniform pattern (E-S
  * sampling precedent): candidate j of anchor a is
  * md5-60(a ‖ ':' ‖ j) mod n_docs — identical in Spark and DuckDB, so
  * the "random" draw is cross-engine exact and replayable. Candidates
  * are over-drawn (2k per anchor), collisions/self-hits/near-dups are
  * filtered, and the first k survivors by draw index are kept.
  *
  * Scale shape: anchors × 2k candidate rows (narrow), one broadcast
  * of the near-dup pair set (duplicate volume, not corpus volume),
  * one window over the per-anchor candidate list. The n_docs scalar
  * is a broadcast 1-row cross join (the a8_global pattern).
  */
object NegativeSampling {

  // fused md5-prefix draw (r15): same value as
  // conv(substring(md5(x), 1, 15), 16, 10) without the hex/conv chain
  private def md5_60(c: org.apache.spark.sql.Column) =
    graft.functions.Md5PrefixLong(c.cast("string"), 15)

  /** (anchor_id, neg_rank, neg_id): k negatives per anchor (anchors =
    * doc_id % anchorMod == 0), near-dups excluded. */
  def sample(docs: DataFrame, k: Int = 4, anchorMod: Int = 10,
      jaccardThreshold: Double = 0.5, maxShingleDF: Long = 12L): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val anchors = docs.filter(col("doc_id") % anchorMod === 0)
      .select(col("doc_id").as("anchor_id"))
    val draws = anchors
      .crossJoin(broadcast(nDocs))
      .withColumn("j", explode(sequence(lit(0), lit(2 * k - 1))))
      .withColumn("neg_id",
        md5_60(concat(col("anchor_id"), lit(":"), col("j"))) % col("n_docs"))
      .filter(col("neg_id") =!= col("anchor_id"))
    val pos = Shingles.exactJaccardPairs(docs, jaccardThreshold, maxShingleDF)
      .select(col("doc_a"), col("doc_b"))
    val posBoth = pos.unionByName(
      pos.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val w = Window.partitionBy(col("anchor_id")).orderBy(col("j"))
    draws
      .join(broadcast(posBoth
          .withColumnRenamed("doc_a", "anchor_id")
          .withColumnRenamed("doc_b", "neg_id")),
        Seq("anchor_id", "neg_id"), "left_anti")
      // same id drawn twice: keep the FIRST draw index (min, not an
      // arbitrary dropDuplicates survivor — the rank must be stable)
      .groupBy(col("anchor_id"), col("neg_id"))
      .agg(min(col("j")).as("j"))
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col("anchor_id"), col("neg_rank"), col("neg_id"))
  }

  /** DuckDB mirror of [[sample]]. */
  def sampleSql(k: Int = 4, anchorMod: Int = 10,
      jaccardThreshold: Double = 0.5, maxShingleDF: Long = 12L): String =
    s"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |anchors AS (SELECT doc_id AS anchor_id FROM documents
       |            WHERE doc_id % $anchorMod = 0),
       |draws AS (
       |  SELECT anchor_id, j,
       |    CAST('0x' || substr(md5(anchor_id || ':' || j), 1, 15) AS BIGINT)
       |      % n_docs AS neg_id
       |  FROM anchors CROSS JOIN n,
       |    (SELECT unnest(generate_series(0, ${2 * k - 1})) AS j) s),
       |pos AS (SELECT doc_a, doc_b
       |        FROM (${Shingles.cappedJaccardSql(jaccardThreshold, maxShingleDF)}) p),
       |posboth AS (SELECT doc_a, doc_b FROM pos
       |            UNION ALL SELECT doc_b, doc_a FROM pos),
       |filtered AS (
       |  SELECT anchor_id, MIN(j) AS j, neg_id
       |  FROM draws d
       |  WHERE neg_id <> anchor_id
       |    AND NOT EXISTS (SELECT 1 FROM posboth pb
       |      WHERE pb.doc_a = d.anchor_id AND pb.doc_b = d.neg_id)
       |  GROUP BY anchor_id, neg_id)
       |SELECT anchor_id, neg_rank, neg_id FROM (
       |  SELECT anchor_id, neg_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY j) AS INT)
       |      AS neg_rank
       |  FROM filtered) t
       |WHERE neg_rank <= $k""".stripMargin
}
