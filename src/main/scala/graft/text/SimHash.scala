package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection with Hamming-distance
  * blocking (Charikar/Manku-style).
  *
  * Signature: for each word-feature hash, add ±1 to 64 bit-counters
  * (weighted by term frequency); sign of each counter is the bit.
  * Detection: pairs within Hamming distance k are found by splitting
  * the 64-bit key into (k+1) blocks — any pair at distance ≤ k must
  * agree exactly on ≥ 1 block (pigeonhole), so candidates come from a
  * bucket join per block, never a cross-join.
  */
object SimHash {

  /** 64-bit simhash of a bag of features. */
  def simhash(features: Iterator[(Long, Int)]): Long = {
    val counters = new Array[Int](64)
    features.foreach { case (h, w) =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += w else counters(b) -= w
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Docs → (doc_id, simhash). Features are words with tf weights.
    * `wordHash` is pluggable: fnv1a64 is the production default,
    * [[MinHashLsh.md5Hash60]] the cross-engine verification instance
    * (its top 4 bits are always 0, so those bit-counters are all
    * negative and the signature's top 4 bits are 0 — the pigeonhole
    * blocking below still holds unchanged). */
  def signatures(docs: DataFrame,
      wordHash: String => Long = MinHashLsh.fnv1a64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).cast("int").as("tf"))
      .as[(Long, String, Int)]
      .groupByKey(_._1)
      .mapGroups((id: Long, it: Iterator[(Long, String, Int)]) =>
        (id, simhash(it.map(t => (wordHash(t._2), t._3)))))
      .toDF("doc_id", "simhash")
  }

  /** Pairs with Hamming distance ≤ maxDist via block bucketing. */
  def nearPairs(sigs: DataFrame, maxDist: Int): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${blocks - 1}), b -> " +
          s"cast(shiftright(simhash, b * $width) & ${(1L << width) - 1} as long))"))
        .as(Seq("block", "key")))
    val a = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"),
      col("block"), col("key"))
    val b = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
      col("block"), col("key"))
    a.join(b, Seq("block", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("sig_a ^ sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Full pipeline: signatures → blocked pairs ≤ maxDist. */
  def nearDuplicates(docs: DataFrame, maxDist: Int = 3,
      wordHash: String => Long = MinHashLsh.fnv1a64): DataFrame =
    nearPairs(signatures(docs, wordHash), maxDist)

  /** DuckDB oracle for `nearDuplicates(_, maxDist, md5Hash60)`: the
    * same 60-bit-md5-word-hash simhash computed in pure SQL (per-bit
    * signed tf sums → sign bits → integer reassembly), then BRUTE-FORCE
    * all-pairs Hamming — so the hash-match also proves the pigeonhole
    * blocked join loses no pair. */
  def md5OracleSql(maxDist: Int): String =
    s"""WITH words AS (
       |  SELECT doc_id, w AS word, CAST(COUNT(*) AS INT) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents) t
       |  GROUP BY doc_id, w
       |), hashed AS (
       |  SELECT doc_id, tf,
       |         CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
       |  FROM words
       |), bits AS (
       |  SELECT doc_id, b,
       |         SUM(CASE WHEN (h >> b) & 1 = 1 THEN tf ELSE -tf END) AS s
       |  FROM hashed, (SELECT unnest(generate_series(0, 59)) AS b) bs
       |  GROUP BY doc_id, b
       |), sigs AS (
       |  SELECT doc_id,
       |         SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
       |             ELSE 0 END) AS simhash
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist""".stripMargin

  /** DuckDB oracle for the PRODUCTION gate `nearDuplicates(_, maxDist)`
    * (r11): fnv1a64 is one (h ^ byte) * prime fold, spelled exactly in
    * u64 HUGEINT arithmetic (graft.util.DuckHash), so the full 64-bit
    * production signature — not just the md5-60 stand-in — has a SQL
    * spelling. Same per-bit tf-sign reassembly and brute-force
    * all-pairs Hamming as [[md5OracleSql]] (signatures stay in the u64
    * domain; `h >> b` is the logical shift the engine's `>>>` does). */
  def fnvOracleSql(maxDist: Int): String =
    s"""WITH words AS (
       |  SELECT doc_id, w AS word, CAST(COUNT(*) AS INT) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents) t
       |  GROUP BY doc_id, w
       |), hashed AS (
       |  SELECT doc_id, tf,
       |         ${graft.util.DuckHash.fnv1a64String("word")} AS h
       |  FROM words
       |), bits AS (
       |  SELECT doc_id, b,
       |         SUM(CASE WHEN (h >> b) & 1::HUGEINT = 1::HUGEINT
       |             THEN tf ELSE -tf END) AS s
       |  FROM hashed, (SELECT unnest(generate_series(0, 63)) AS b) bs
       |  GROUP BY doc_id, b
       |), sigs AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN s > 0 THEN (1::HUGEINT << b)
       |             ELSE 0::HUGEINT END) AS HUGEINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist""".stripMargin
}
