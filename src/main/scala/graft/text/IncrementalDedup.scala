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
  * The result is EXACT modulo full-128-bit-md5 collisions (the
  * cryptographic-digest caveat every content-hash dedup carries, with
  * a ~2⁻⁶⁴-scale birthday bound at 10⁹ docs): the sketch only ROUTES
  * rows on a 60-bit fold of the digest (where collisions merely add a
  * few false-positive candidates), while the verification anti-join
  * compares the FULL digest — a 60-bit join key there would make
  * silent drops of genuinely-new docs likely at reference scale
  * (birthday at 2⁶⁰ ≈ 10⁹ keys).
  */
object IncrementalDedup {

  /** Full 128-bit md5 content digest of `text` (32-hex string) — the
    * verification join currency. */
  def contentMd5: Column = md5(col("text").cast("binary"))

  /** 60-bit fold of [[contentMd5]] as a long — the Bloom ROUTING
    * currency only (the sketch API wants a long; routing collisions
    * are verified away, never dropped). */
  def contentHash60: Column =
    graft.functions.Md5PrefixLong(col("text").cast("binary"), 15)

  /** Docs of `newDocs` whose text content does not occur in `refDocs`.
    * Output: (doc_id, content_h). `expectedRef` sizes the filter (pass
    * the reference cardinality or an upper bound). */
  def newOnly(newDocs: DataFrame, refDocs: DataFrame,
      expectedRef: Long, fpp: Double = 0.01): DataFrame = {
    val spark = newDocs.sparkSession
    // lean digest projections (id + 32-hex + long), each referenced
    // twice (bloom build + verify side; definitely-new + candidate
    // arms) — pinned so the full-text md5 pass over each corpus runs
    // once (scan-censused 6 → 2 source scans on the gate)
    val refH = refDocs.select(contentMd5.as("content_md5"),
      contentHash60.as("content_h"))
      .localCheckpoint(true)
    // ONE distributed pass builds the sketch; the driver fetches the
    // single finished filter (bounded: the sketch, not the data).
    val agg = udaf(new BloomFilterAgg(expectedRef, fpp),
      org.apache.spark.sql.Encoders.scalaLong)
    val bytes = refH.agg(agg(col("content_h")).as("bf"))
      .head().getAs[Array[Byte]](0)
    // content-addressed name: concurrent filters in one session can't
    // race on a shared registration
    val fn = BloomMightContainLong.registerUnique(spark, bytes)
    val newH = newDocs.select(col("doc_id"), contentMd5.as("content_md5"),
      contentHash60.as("content_h"))
      .localCheckpoint(true)
    val definitelyNew = newH.filter(!expr(s"$fn(content_h)"))
    // candidates = true dups + ~fpp false positives; only these join,
    // and they verify on the FULL digest, not the routing fold
    val candidates = newH.filter(expr(s"$fn(content_h)"))
    val verifiedNew = candidates
      .join(refH.select("content_md5"), Seq("content_md5"), "left_anti")
    definitelyNew.select("doc_id", "content_h")
      .unionByName(verifiedNew.select("doc_id", "content_h"))
  }

  /** The gate corpus: reference = doc_id < `refMax`; new shard = the
    * remaining docs PLUS planted re-crawls (every 7th reference doc
    * reappears under a shifted id with identical text — deterministic,
    * row-local, SQL-expressible). */
  def gateQuery(docs: DataFrame, refMax: Long = 250L): DataFrame = {
    // referenced by recrawls, the sizing count, and the digest side
    val ref = docs.filter(col("doc_id") < refMax).localCheckpoint(true)
    val recrawls = ref.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val newShard = docs.filter(col("doc_id") >= refMax).unionByName(recrawls)
    // sizing: exact count of the reference side (cheap metadata-ish
    // aggregation; at fleet scale pass a catalog estimate instead)
    newOnly(newShard, ref, expectedRef = math.max(ref.count(), 1L))
  }

  /** DuckDB oracle: the exact semantics the bloom path must reproduce
    * — new shard (incl. planted re-crawls) anti-joined on the FULL
    * md5 digest (the 60-bit fold appears only as a display column,
    * mirroring the Spark output schema). */
  def gateSql(refMax: Long = 250L): String =
    s"""WITH refh AS (
       |  SELECT md5(text) AS content_md5
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
       |WHERE md5(n.text) NOT IN (SELECT content_md5 FROM refh)""".stripMargin
}
