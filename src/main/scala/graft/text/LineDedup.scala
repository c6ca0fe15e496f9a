package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style corpus-global span deduplication (Raffel et al. 2020, §2.2:
  * "we discarded all but one of any three-sentence span occurring more
  * than once in the data set"). The corpus here is whitespace-tokenized
  * with no sentence markers, so the span unit is a fixed window of
  * `chunkWords` consecutive words (disjoint chunks, like C4's disjoint
  * three-sentence spans); every chunk that occurs more than once
  * corpus-wide survives only at its FIRST occurrence — (doc_id,
  * chunk_idx) lexicographic minimum — and each document is rebuilt from
  * its surviving chunks in order.
  *
  * Scale shape for 100 TB: one explode to (chunk, doc, idx), ONE
  * hash-aggregate on the chunk text to pick the global keeper, one join
  * back on the chunk key, and a per-doc rebuild aggregate — two
  * shuffles total, both map-side combinable, nothing corpus-global on
  * the driver. The chunk key could ride an 8-byte xxhash64 instead of
  * the raw string at deployment scale (the same witness/scale-path
  * split as SubstringDedup); the gate keeps the raw string so the
  * DuckDB oracle is exact on the text itself.
  *
  * The global keeper is the lexicographic minimum of the (doc_id,
  * chunk_idx) pair, taken as `min(struct(doc_id, ci))` on the Spark
  * side and `MIN(ROW(doc_id, ci))` in DuckDB — no scalar encoding, so
  * there is no chunk-count bound on document length.
  */
object LineDedup {

  /** Per-doc rebuild after global chunk dedup.
    * @return (doc_id, n_chunks, n_kept, clean_text) for every doc;
    *         clean_text = '' when every chunk was a later duplicate. */
  def dedupChunks(docs: DataFrame, chunkWords: Int = 8): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, (size(ws) + ${chunkWords - 1}) div $chunkWords - 1),
             |  i -> struct(i AS ci,
             |              array_join(slice(ws, i * $chunkWords + 1, $chunkWords), ' ') AS chunk))"""
            .stripMargin)).as("c"))
      .select(col("doc_id"), col("c.ci").as("ci"), col("c.chunk").as("chunk"),
        struct(col("doc_id"), col("c.ci")).as("occ_key"))
    val keeper = chunks.groupBy(col("chunk"))
      .agg(min(col("occ_key")).as("keep_key"))
    chunks.join(keeper, Seq("chunk"))
      .withColumn("kept", col("occ_key") === col("keep_key"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("kept").cast("long")).as("n_kept"),
        array_join(
          expr("transform(array_sort(collect_list(CASE WHEN kept THEN struct(ci, chunk) END)), x -> x.chunk)"),
          " ").as("clean_text"))
  }

  /** DuckDB mirror: identical chunking, keeper rule, and rebuild.
    * `from` parameterizes the source relation so composed pipelines
    * (the FineWeb funnel) can reuse the same CTE chain. */
  def dedupChunksSql(chunkWords: Int = 8, from: String = "documents"): String =
    s"""WITH ${dedupChunksCtes(chunkWords, from)}
       |SELECT * FROM rebuilt""".stripMargin

  /** The CTE chain up to `rebuilt(doc_id, n_chunks, n_kept,
    * clean_text)` — shared by [[dedupChunksSql]] and composed gates. */
  def dedupChunksCtes(chunkWords: Int = 8, from: String = "documents"): String =
    s"""ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM $from),
       |ch AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS ci,
       |    array_to_string(w[CAST(i AS INT) * $chunkWords + 1 :
       |                     (CAST(i AS INT) + 1) * $chunkWords], ' ') AS chunk,
       |    ROW(doc_id, CAST(i AS BIGINT)) AS occ_key
       |  FROM ws, unnest(generate_series(0, (len(w) + ${chunkWords - 1}) // $chunkWords - 1)) t(i)),
       |keep AS (SELECT chunk, MIN(occ_key) AS keep_key FROM ch GROUP BY 1),
       |rebuilt AS (
       |  SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |    CAST(SUM(CASE WHEN ch.occ_key = k.keep_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    COALESCE(string_agg(CASE WHEN ch.occ_key = k.keep_key THEN ch.chunk END, ' '
       |                        ORDER BY ch.ci), '') AS clean_text
       |  FROM ch JOIN keep k USING (chunk)
       |  GROUP BY 1)""".stripMargin
}
