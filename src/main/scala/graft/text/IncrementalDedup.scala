package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BloomFilterAgg, BloomMightContainLong}

/** Incremental (cross-snapshot) exact dedup: which docs of a NEW shard
  * are not already in the REFERENCE corpus? The daily-crawl question a
  * training-data pipeline answers constantly — and the one place a
  * plain anti-join is the wrong 100 TB plan: it shuffles the ENTIRE new
  * shard against the entire reference hash set every day.
  *
  * Scale shape here: the reference is distilled ONCE into a Bloom
  * filter (distributed build via [[BloomFilterAgg]], one pass, bit-OR
  * merge; ~1.2 GB per 10⁹ docs at 1% fpp — a broadcastable artifact
  * that can be persisted and reused across runs). The new shard then
  * streams through a narrow codegen'd membership filter
  * ([[BloomMightContainLong]]):
  *   - bloom-negative docs are DEFINITELY new (no false negatives) —
  *     they pass with zero shuffle;
  *   - bloom-positive docs (true dups + ~fpp false positives) are the
  *     only rows that reach the exact verification anti-join, so the
  *     shuffle carries the duplicate volume, not the shard volume.
  * The result is EXACT — the sketch only routes rows — which is why
  * the gate oracle is a plain anti-join.
  *
  * The join currency is the md5-60 content hash (16-byte text digest
  * folded to a long), the same cross-engine hash the other dedup
  * gates use.
  */
object IncrementalDedup {

  /** md5-60 content hash of `text` as a long column. */
  def contentHash60: Column =
    conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Docs of `newDocs` whose text content does not occur in `refDocs`.
    * Output: (doc_id, content_h). `expectedRef` sizes the filter (pass
    * the reference cardinality or an upper bound). */
  def newOnly(newDocs: DataFrame, refDocs: DataFrame,
      expectedRef: Long, fpp: Double = 0.01): DataFrame = {
    val spark = newDocs.sparkSession
    val refH = refDocs.select(contentHash60.as("content_h"))
    // ONE distributed pass builds the sketch; the driver fetches the
    // single finished filter (bounded: the sketch, not the data).
    val agg = udaf(new BloomFilterAgg(expectedRef, fpp),
      org.apache.spark.sql.Encoders.scalaLong)
    val bytes = refH.agg(agg(col("content_h")).as("bf"))
      .head().getAs[Array[Byte]](0)
    // content-addressed name: concurrent filters in one session can't
    // race on a shared registration
    val fn = BloomMightContainLong.registerUnique(spark, bytes)
    val newH = newDocs.select(col("doc_id"), contentHash60.as("content_h"))
    val definitelyNew = newH.filter(!expr(s"$fn(content_h)"))
    // candidates = true dups + ~fpp false positives; only these join
    val candidates = newH.filter(expr(s"$fn(content_h)"))
    val verifiedNew = candidates.join(refH, Seq("content_h"), "left_anti")
      .select("doc_id", "content_h")
    definitelyNew.select("doc_id", "content_h").unionByName(verifiedNew)
  }

  /** The gate corpus: reference = doc_id < `refMax`; new shard = the
    * remaining docs PLUS planted re-crawls (every 7th reference doc
    * reappears under a shifted id with identical text — deterministic,
    * row-local, SQL-expressible). */
  def gateQuery(docs: DataFrame, refMax: Long = 250L): DataFrame = {
    val ref = docs.filter(col("doc_id") < refMax)
    val recrawls = ref.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val newShard = docs.filter(col("doc_id") >= refMax).unionByName(recrawls)
    // sizing: exact count of the reference side (cheap metadata-ish
    // aggregation; at fleet scale pass a catalog estimate instead)
    newOnly(newShard, ref, expectedRef = math.max(ref.count(), 1L))
  }

  /** DuckDB oracle: the exact semantics the bloom path must reproduce
    * — new shard (incl. planted re-crawls) anti-joined on content
    * hash. */
  def gateSql(refMax: Long = 250L): String =
    s"""WITH refh AS (
       |  SELECT CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS content_h
       |  FROM documents WHERE doc_id < $refMax
       |), newshard AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id >= $refMax
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents
       |  WHERE doc_id < $refMax AND doc_id % 7 = 0
       |)
       |SELECT n.doc_id,
       |       CAST('0x' || substr(md5(n.text), 1, 15) AS BIGINT) AS content_h
       |FROM newshard n
       |WHERE CAST('0x' || substr(md5(n.text), 1, 15) AS BIGINT) NOT IN
       |      (SELECT content_h FROM refh)""".stripMargin
}
