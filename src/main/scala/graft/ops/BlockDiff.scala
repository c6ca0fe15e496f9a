package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-checksum table reconciliation — "which buckets changed between
  * snapshot A and snapshot B" without shipping or comparing rows. Each
  * side collapses to per-bucket (row count, XOR of row-content hashes)
  * in one partial-aggregated shuffle of 16-byte summaries; the compare
  * then touches `buckets` rows, never the table. This is the
  * anti-entropy primitive behind incremental sync / backfill-scoping at
  * 100 TB: a follow-up pass re-reads ONLY flagged buckets (bucket =
  * key % buckets ⇒ a selective predicate on the key column, which
  * prunes on a key-sorted/bucketed layout — see sources/Bucketing).
  *
  * XOR is the right fold: commutative+associative (partition-order
  * free), self-inverse (an unchanged row pair cancels even when other
  * rows in the bucket churn), and collision-resistant enough at 60
  * bits per row hash for change DETECTION (a false "unchanged" needs
  * the xor of the changed rows' hashes to collide — ~2⁻⁶⁰ per bucket).
  * Count is carried alongside so insert+delete of equal-hash multisets
  * still flags.
  *
  * Oracle exactness: the row hash is the repo's cross-engine md5-60
  * currency (`conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), and bit_xor/count
  * aggregate identically in both engines.
  */
object BlockDiff {

  /** 60-bit md5 content hash of the '|'-joined key + content columns. */
  private def rowHash(keyCol: String, contentCols: Seq[String]) =
    graft.functions.Md5PrefixLong(
      concat_ws("|", (keyCol +: contentCols).map(col): _*).cast("binary"), 15)

  /** Per-bucket summary of one snapshot: (bucket, n, xor_h). */
  def summarize(df: DataFrame, keyCol: String, contentCols: Seq[String],
      buckets: Int): DataFrame =
    df.withColumn("bucket", pmod(col(keyCol), lit(buckets.toLong)))
      .withColumn("h", rowHash(keyCol, contentCols))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("xor_h"))

  /** Buckets whose content differs between the snapshots, with both
    * sides' counts (0 = bucket absent on that side). */
  def changedBuckets(a: DataFrame, b: DataFrame, keyCol: String,
      contentCols: Seq[String], buckets: Int): DataFrame = {
    val sa = summarize(a, keyCol, contentCols, buckets)
      .withColumnRenamed("n", "n_a").withColumnRenamed("xor_h", "xor_a")
    val sb = summarize(b, keyCol, contentCols, buckets)
      .withColumnRenamed("n", "n_b").withColumnRenamed("xor_h", "xor_b")
    sa.join(sb, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b", "xor_a", "xor_b"))
      .filter(col("n_a") =!= col("n_b") || col("xor_a") =!= col("xor_b"))
      .select(col("bucket"), col("n_a"), col("n_b"),
        col("xor_a"), col("xor_b"))
  }

  /** DuckDB mirror of [[changedBuckets]] for documents-shaped
    * snapshots keyed by `doc_id` with content column `text`. */
  def changedBucketsSql(aSql: String, bSql: String, buckets: Int): String = {
    def side(src: String, n: String, x: String) =
      s"""SELECT doc_id % $buckets AS bucket, CAST(count(*) AS BIGINT) AS $n,
         |    bit_xor(CAST('0x' || substr(md5(doc_id || '|' || text), 1, 15)
         |      AS BIGINT)) AS $x
         |  FROM ($src) t GROUP BY 1""".stripMargin
    s"""WITH sa AS (${side(aSql, "n_a", "xor_a")}),
       |sb AS (${side(bSql, "n_b", "xor_b")})
       |SELECT COALESCE(sa.bucket, sb.bucket) AS bucket,
       |  COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
       |  COALESCE(xor_a, 0) AS xor_a, COALESCE(xor_b, 0) AS xor_b
       |FROM sa FULL JOIN sb ON sa.bucket = sb.bucket
       |WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
       |   OR COALESCE(xor_a, 0) <> COALESCE(xor_b, 0)""".stripMargin
  }
}
