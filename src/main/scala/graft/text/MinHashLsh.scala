package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash signatures + LSH banding for near-duplicate candidate
  * generation, with exact-Jaccard verification of candidates.
  *
  * Pipeline (shingle → minhash → band → bucket-join → verify):
  *  1. 64 minhash values per doc via universal hashing over 61-bit
  *     shingle hashes: h_i(x) = (a_i·x + b_i) mod (2^61−1), constants
  *     derived deterministically from splitmix64 — no RNG state, so
  *     signatures are reproducible on any executor.
  *  2. Band the signature (numBands × rowsPerBand), hash each band,
  *     group by (band, hash) → candidate pairs.
  *  3. Verify candidates with exact Jaccard over shingle sets; keep
  *     pairs ≥ threshold.
  *
  * Scale: signatures are one narrow row per doc (64 longs); the band
  * explode is ×numBands; bucket join costs Σ f(bucket)² which the
  * banding keeps tiny for non-duplicates. Verification touches only
  * candidate pairs. This is the standard web-scale near-dup design.
  */
object MinHashLsh {

  val NumHashes = 64
  private val P61 = (1L << 61) - 1

  /** splitmix64 — deterministic constant stream. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val hashA: Array[Long] =
    Array.tabulate(NumHashes)(i => (splitmix64(2 * i) & P61) | 1L)
  private val hashB: Array[Long] =
    Array.tabulate(NumHashes)(i => splitmix64(2 * i + 1) & P61)

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Cross-engine-checkable 60-bit hash: the first 15 hex chars of
    * md5(s) as an unsigned value (= big-endian first 8 digest bytes
    * >>> 4). Equals DuckDB's `CAST('0x' || substr(md5(s),1,15) AS
    * BIGINT)` and Spark SQL's `conv(substring(md5(s),1,15),16,10)`
    * bit-for-bit, which is what lets sketch operators built on it be
    * gated oracle-exact instead of rows-only. Production paths keep
    * [[fnv1a64]] (full 64 bits, ~20× cheaper); the hash is a pluggable
    * parameter, this one is the verification instance. */
  def md5Hash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** a·x mod 2^61−1 via the 128-bit product and the Mersenne identity
    * 2^64 ≡ 8 (mod 2^61−1). a, x ∈ [0, 2^61) so hi < 2^58 and every
    * intermediate stays below 2^63. */
  private def mulmodP61(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // unsigned == signed here (product < 2^122)
    val lo = a * x
    var r = (hi << 3) + (lo & P61) + (lo >>> 61)
    r = (r & P61) + (r >>> 61)
    if (r >= P61) r -= P61
    r
  }

  /** 64-long minhash signature of a set of shingle hashes. */
  def signature(shingleHashes: Iterator[Long]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    shingleHashes.foreach { raw =>
      val x = raw & P61
      var i = 0
      while (i < NumHashes) {
        var v = mulmodP61(hashA(i), x) + hashB(i)
        if (v >= P61) v -= P61
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Docs → (doc_id, signature array<long>). A doc's shingles are a
    * row-local computation, so signatures need NO shuffle at all: one
    * narrow mapPartitions pass shingles, hashes (xxhash64 via Spark's
    * XxHash64Function, identical to the shingle-table column), and
    * folds the minhash in-line. */
  def signatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val words = text.split(" ", -1)
        val shingles = new java.util.HashSet[Long]()
        var i = 0
        while (i + 2 < words.length) {
          val s = words(i) + " " + words(i + 1) + " " + words(i + 2)
          shingles.add(xxhash64String(s))
          i += 1
        }
        val it = new Iterator[Long] {
          private val inner = shingles.iterator()
          def hasNext: Boolean = inner.hasNext
          def next(): Long = inner.next()
        }
        (id, signature(it))
      })
      .toDF("doc_id", "sig")
  }

  /** Signatures derived from an already-computed (and typically cached)
    * [[Shingles.shingleSets]] frame — the single-scan variant: when a
    * pipeline needs both the shingle table and the signatures, sharing
    * the one shingling pass halves the text-scan work. Narrow map, no
    * shuffle. */
  def signaturesFromSets(sets: DataFrame): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    sets.select(col("doc_id"), col("shingles")).as[(Long, Array[Long])]
      .mapPartitions(_.map { case (id, arr) => (id, signature(arr.iterator)) })
      .toDF("doc_id", "sig")
  }

  /** Spark's xxhash64(string) with the default seed 42 — matches the
    * `xxhash64` column function used by Shingles.shingleHashTable. */
  def xxhash64String(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes),
      org.apache.spark.sql.types.StringType, 42L)
  }

  /** Band-bucket table of a signature frame: (id, band, bucket). */
  private def bandBuckets(sigs: DataFrame, idName: String,
      numBands: Int): DataFrame = {
    val rows = NumHashes / numBands
    sigs.select(col("doc_id").as(idName),
      posexplode(expr(
        s"transform(sequence(0, ${numBands - 1}), b -> " +
          s"hash(slice(sig, b * $rows + 1, $rows)))")).as(Seq("band", "bucket")))
  }

  /** Cross-shard near-dup: which NEW docs are near-duplicates of any
    * REFERENCE doc — the fuzzy counterpart of
    * [[IncrementalDedup.newOnly]] (exact hash misses a re-crawl whose
    * text was touched; this catches it). Both sides shingle+sign
    * independently (one narrow scan each, no cross-side shuffle until
    * the band-bucket join), candidates are cross-side band-bucket
    * matches only, and only candidates pay the exact-Jaccard verify —
    * so cost scales with near-dup volume, not |new|·|ref|. */
  def crossNearDuplicates(newDocs: DataFrame, refDocs: DataFrame,
      threshold: Double, numBands: Int = 16): DataFrame = {
    val newSets = Shingles.shingleSets(newDocs).cache()
    val refSets = Shingles.shingleSets(refDocs).cache()
    val newSh = newSets.select(col("doc_id").as("new_doc"),
      explode(col("shingles")).as("shingle"))
    val refSh = refSets.select(col("doc_id").as("ref_doc"),
      explode(col("shingles")).as("shingle"))
    val newSizes = newSets.select(col("doc_id").as("new_doc"),
      size(col("shingles")).cast("long").as("size_new")).localCheckpoint(true)
    val refSizes = refSets.select(col("doc_id").as("ref_doc"),
      size(col("shingles")).cast("long").as("size_ref")).localCheckpoint(true)
    val cands = bandBuckets(signaturesFromSets(newSets), "new_doc", numBands)
      .join(bandBuckets(signaturesFromSets(refSets), "ref_doc", numBands),
        Seq("band", "bucket"))
      .select("new_doc", "ref_doc").distinct()
    val common = cands
      .join(newSh, Seq("new_doc"))
      .join(refSh, Seq("ref_doc", "shingle"))
      .groupBy(col("new_doc"), col("ref_doc"))
      .agg(count(lit(1)).as("common"))
      .localCheckpoint(true)
    newSets.unpersist(false)
    refSets.unpersist(false)
    common
      .join(newSizes, "new_doc")
      .join(refSizes, "ref_doc")
      .withColumn("jaccard", col("common").cast("double") /
        (col("size_new") + col("size_ref") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_doc"), col("ref_doc"), col("common"),
        col("size_new"), col("size_ref"), col("jaccard"))
  }

  /** Candidate pairs from banding: docs sharing any band bucket.
    *
    * The trailing `.distinct()` is deliberately BEFORE the exact-verify
    * join, not after: a pair colliding in m bands appears m times
    * (m ≤ numBands), and deduping late would multiply the verify
    * join's shingle fan-out — |pair| × |shared shingles| rows — by
    * that same m, a strictly larger shuffle than the bare (a, b) id
    * pairs this distinct exchanges. Dedup cost here is the floor, not
    * the nit. */
  def candidatePairs(sigs: DataFrame, numBands: Int): DataFrame = {
    val rows = NumHashes / numBands
    val banded = sigs.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${numBands - 1}), b -> " +
          s"hash(slice(sig, b * $rows + 1, $rows)))")).as(Seq("band", "bucket")))
    val a = banded.select(col("doc_id").as("doc_a"), col("band"), col("bucket"))
    val b = banded.select(col("doc_id").as("doc_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Full near-dup pipeline: LSH candidates → exact-Jaccard verify,
    * computed ONLY on candidate pairs (the whole point of LSH: the
    * all-pairs shingle join is replaced by candidate-pair lookups, so
    * verification cost scales with duplicates found, not corpus²). */
  def nearDuplicates(docs: DataFrame, threshold: Double,
      numBands: Int = 16): DataFrame = {
    // ONE shingling scan feeds everything: the exploded shingle table
    // (candidate verification), the set sizes (narrow array length, no
    // groupBy shuffle), and the minhash signatures (narrow fold).
    val sets = Shingles.shingleSets(docs).cache()
    val sh = sets.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val sizes = sets.select(col("doc_id"), size(col("shingles")).cast("long").as("sz"))
      .localCheckpoint(true)
    val cands = candidatePairs(signaturesFromSets(sets), numBands)
    // Pin the (small: candidates × shared shingles → per-pair counts)
    // verification result and the per-doc sizes eagerly, then drop the
    // shingle cache — otherwise it leaks executor storage memory for
    // the rest of the session on every call.
    val common = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
      .localCheckpoint(true)
    sets.unpersist(false)
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "size_b"), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("common"), col("size_a"),
        col("size_b"), col("jaccard"))
  }
}
