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

  /** Docs → (doc_id, simhash). Features are words with tf weights. */
  def signatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).cast("int").as("tf"))
      .as[(Long, String, Int)]
      .groupByKey(_._1)
      .mapGroups((id: Long, it: Iterator[(Long, String, Int)]) =>
        (id, simhash(it.map(t => (MinHashLsh.fnv1a64(t._2), t._3)))))
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
  def nearDuplicates(docs: DataFrame, maxDist: Int = 3): DataFrame =
    nearPairs(signatures(docs), maxDist)
}
