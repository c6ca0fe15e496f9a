package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window chunk extraction — the RAG / context-window prep
  * step of a training-data pipeline: each document is cut into
  * `windowTokens`-token chunks every `stride` tokens (overlap =
  * window − stride), so no passage is ever split without also
  * appearing whole in a neighboring chunk. Complements
  * [[ChunkDedup]] (non-overlapping hashes for dedup); this op
  * PRODUCES the chunk stream a retrieval index or packing stage
  * consumes.
  *
  * Window-count rule (mirrored exactly in the oracle, all-integer
  * arithmetic): k = 1 if n ≤ window else ⌈(n − window)/stride⌉ + 1 —
  * the minimal set of stride-aligned windows covering every token;
  * the final window is allowed to run short.
  *
  * Scale shape at 100 TB: one narrow scan, zero shuffles — the
  * explode is pipelined inside the scan stage and output row count is
  * ~n/stride per doc. Chunk hashes (not text, unless asked) leave the
  * operator, so downstream shuffles carry 16-byte digests.
  */
object Chunker {

  /** Per-chunk rows: (doc_id, chunk_idx, start_tok, chunk_tokens,
    * chunk_md5 [, chunk]). `withText` controls whether the raw chunk
    * text is carried (indexing) or only its digest (dedup/gates). */
  def overlappingChunks(docs: DataFrame, windowTokens: Int = 64,
      stride: Int = 48, withText: Boolean = false): DataFrame = {
    require(windowTokens > 0 && stride > 0 && stride <= windowTokens,
      s"need 0 < stride <= window, got window=$windowTokens stride=$stride")
    val exploded = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("k", expr(
        s"IF(size(ws) <= $windowTokens, 1, " +
          s"((size(ws) - $windowTokens + $stride - 1) div $stride) + 1)"))
      .select(col("doc_id"), col("ws"),
        posexplode(expr(
          s"transform(sequence(0, CAST(k AS INT) - 1), i -> i * $stride)"))
          .as(Seq("chunk_idx", "start_tok")))
    val chunk = concat_ws(" ",
      slice(col("ws"), col("start_tok") + 1, lit(windowTokens)))
    val base = exploded.select(
      col("doc_id"), col("chunk_idx"), col("start_tok"),
      least(lit(windowTokens), size(col("ws")) - col("start_tok"))
        .cast("int").as("chunk_tokens"),
      md5(chunk.cast("binary")).as("chunk_md5"),
      chunk.as("chunk"))
    if (withText) base else base.drop("chunk")
  }

  /** DuckDB oracle: identical window-count rule and slicing. */
  def overlappingChunksSql(windowTokens: Int = 64, stride: Int = 48,
      srcSql: String = "SELECT doc_id, text FROM documents"): String = {
    val (w, s) = (windowTokens, stride)
    s"""WITH src AS ($srcSql),
       |t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM src),
       |sized AS (
       |  SELECT doc_id, ws, len(ws) AS n,
       |    CASE WHEN len(ws) <= $w THEN 1
       |         ELSE ((len(ws) - $w + $s - 1) // $s) + 1 END AS k
       |  FROM t)
       |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       |  CAST(i * $s AS INT) AS start_tok,
       |  CAST(LEAST($w, n - i * $s) AS INT) AS chunk_tokens,
       |  md5(array_to_string(
       |    ws[CAST(i * $s + 1 AS INT) : CAST(i * $s + $w AS INT)],
       |    ' ')) AS chunk_md5
       |FROM sized, unnest(generate_series(0, CAST(k AS INT) - 1)) g(i)""".stripMargin
  }
}
