package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming keyed-table maintenance: a `foreachBatch` sink that
  * MERGEs each micro-batch into a parquet-backed dimension table via
  * [[graft.sources.Dims.upsert]] — the streaming face of the S2 upsert
  * seam. Spark's foreachBatch gives at-least-once batch delivery
  * (a batch can re-run after a crash), so the sink is made EFFECTIVELY
  * exactly-once the standard way: the merge itself is IDEMPOTENT
  * (last-write-wins per key — replaying a batch rewrites the same key
  * to the same value) and a committed-batch-id guard skips batches the
  * table has already absorbed (the batchId rides in a sidecar file,
  * written after the swap — re-running an absorbed batch is a no-op
  * even when updates are not naturally idempotent).
  *
  * At 100 TB the merge cost is one full-outer join per trigger against
  * the dimension (small by definition — facts stream, dims upsert);
  * the swap is atomic-rename within the table directory. Delta/Iceberg
  * deployments replace the write+swap with MERGE INTO, the guard with
  * txn versions — same dataflow.
  */
object UpsertSink {

  private def committedBatch(dir: String): Long = {
    val f = new java.io.File(s"$dir/_committed_batch")
    if (f.exists) new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong
    else -1L
  }

  /** Start maintaining `tableDir` (parquet, keyed by `keys`) from
    * `updates`. `availableNow = true` drains the backlog and stops
    * (backfill mode); `false` keeps a live micro-batch loop (ingest
    * mode — caller stops the query). */
  def maintain(spark: SparkSession, updates: DataFrame, tableDir: String,
      checkpointDir: String, keys: Seq[String],
      availableNow: Boolean = true): StreamingQuery = {
    // explicit Scala function type disambiguates the foreachBatch
    // overloads (Scala lambda vs Java VoidFunction2)
    val mergeBatch: (DataFrame, Long) => Unit = (batch, batchId) =>
        if (batchId > committedBatch(tableDir)) {
          val s = batch.sparkSession
          val dir = new java.io.File(tableDir)
          val existing =
            if (new java.io.File(s"$tableDir/current").exists)
              s.read.parquet(s"$tableDir/current")
            else batch.limit(0)
          // batch may carry the same key several times; collapse to the
          // latest row per key first (deterministic: max by all columns)
          val latest = batch.groupBy(keys.map(col): _*)
            .agg(max(struct(batch.columns.filterNot(keys.contains).map(col): _*))
              .as("_v"))
            .select(keys.map(col) ++ batch.columns.filterNot(keys.contains)
              .map(c => col(s"_v.$c").as(c)): _*)
          val merged = graft.sources.Dims.upsert(existing, latest, keys)
          val tmp = s"$tableDir/_staging_$batchId"
          merged.write.mode("overwrite").parquet(tmp)
          dir.mkdirs()
          val cur = new java.io.File(s"$tableDir/current")
          if (cur.exists) {
            val old = new java.io.File(s"$tableDir/_old_$batchId")
            cur.renameTo(old)
            new java.io.File(tmp).renameTo(cur)
            org.apache.commons.io.FileUtils.deleteDirectory(old)
          } else new java.io.File(tmp).renameTo(cur)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$tableDir/_committed_batch"),
            batchId.toString.getBytes("UTF-8"))
          () // keep the lambda Unit-typed
        } // else: replayed batch already absorbed — idempotent skip
    val w = updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(mergeBatch)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
