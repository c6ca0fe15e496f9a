package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level (passage-level) exact deduplication — the
  * boilerplate-removal step of a pretraining pipeline: documents are
  * cut into fixed-width non-overlapping word chunks, chunks are
  * hashed, and every occurrence after the first (ordered by
  * (doc_id, chunk_idx)) is flagged as a duplicate. Whole-document
  * dedup misses the license header pasted into a million otherwise
  * distinct pages; this catches exactly that.
  *
  * Plan shape at 100 TB: one narrow chunk-explode scan; one shuffle on
  * the 8-byte chunk hash (a window row_number per hash — first
  * occurrence wins deterministically); one shuffle back on doc_id for
  * the per-doc rollup. Chunk width trades granularity against row
  * count; hashes, not chunk text, are the shuffle currency.
  */
object ChunkDedup {

  /** Per-doc duplicate-chunk stats over `chunkWords`-word chunks:
    * (doc_id, n_chunks, n_dup_chunks, dup_frac). A chunk occurrence is
    * a duplicate iff an identical chunk exists at a lexicographically
    * earlier (doc_id, chunk_idx). */
  def dupChunkStats(docs: DataFrame, chunkWords: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("chunk_idx"))
    val chunks = docs
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(ceil(size(ws) / $chunkWords.0) AS INT) - 1), " +
            s"i -> concat_ws(' ', slice(ws, i * $chunkWords + 1, $chunkWords)))"))
          .as(Seq("chunk_idx", "chunk")))
      // 8-byte xxhash64 currency — the chunk text stays in the scan;
      // the oracle's md5 grouping agrees whenever neither collides
      .select(col("doc_id"), col("chunk_idx"), xxhash64(col("chunk")).as("h"))
    chunks
      .withColumn("occ", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("occ") > 1, 1)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") /
          col("n_chunks").cast("double")).as("dup_frac"))
  }

  /** DuckDB oracle: identical chunking, hashing, and first-wins rule.
    * `srcSql` supplies the (doc_id, text) source — defaults to the raw
    * table; the gate passes the boilerplated CTE. */
  def dupChunkStatsSql(chunkWords: Int = 16,
      srcSql: String = "SELECT doc_id, text FROM documents"): String =
    s"""WITH src AS ($srcSql),
       |chunks AS (
       |  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       |    md5(array_to_string(
       |      ws[CAST(i * $chunkWords + 1 AS INT) :
       |         CAST(i * $chunkWords + $chunkWords AS INT)], ' ')) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM src) t,
       |  unnest(generate_series(0,
       |    CAST(ceil(len(ws) / $chunkWords.0) AS INT) - 1)) s(i)
       |), occ AS (
       |  SELECT doc_id, chunk_idx, h,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS occ
       |  FROM chunks
       |)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(count(CASE WHEN occ > 1 THEN 1 END) AS BIGINT) AS n_dup_chunks,
       |  CAST(count(CASE WHEN occ > 1 THEN 1 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS dup_frac
       |FROM occ GROUP BY 1""".stripMargin

  /** Deterministic boilerplate planting for the gate corpus: the raw
    * synthetic docs have no repeated passages (measured: zero exact
    * dups), so every third doc gets a fixed `chunkWords`-word header
    * PREPENDED — chunk-aligned, exactly how license/nav boilerplate
    * shows up in crawled corpora. */
  def withBoilerplate(docs: DataFrame, chunkWords: Int = 16): DataFrame = {
    val header = boilerplateHeader(chunkWords)
    docs.withColumn("text",
      when(col("doc_id") % 3 === 0, concat(lit(header + " "), col("text")))
        .otherwise(col("text")))
  }

  def boilerplateHeader(chunkWords: Int = 16): String =
    (0 until chunkWords).map(i => s"boiler${i % 4}term$i").mkString(" ")

  /** DuckDB spelling of [[withBoilerplate]], shaped to drop into
    * [[dupChunkStatsSql]]'s `srcSql` slot. */
  def withBoilerplateSql(chunkWords: Int = 16): String =
    s"""SELECT doc_id,
       |  CASE WHEN doc_id % 3 = 0
       |       THEN '${boilerplateHeader(chunkWords)} ' || text
       |       ELSE text END AS text
       |FROM documents""".stripMargin
}
