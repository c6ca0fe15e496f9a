package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming keyed-table maintenance: a `foreachBatch` sink that
  * MERGEs each micro-batch into a parquet-backed dimension table via
  * [[graft.sources.Dims.upsert]] — the streaming face of the S2 upsert
  * seam (the reference's `update_one(upsert=True)` loop,
  * F1_Data_Collect.ipynb:113-117, run forever instead of per-notebook).
  *
  * Exactly-once without a transactional table format, done properly:
  *
  *  - '''Last-write-wins needs an ordering.''' A micro-batch can carry
  *    the same key several times; "latest" is defined by the caller's
  *    explicit `orderCol` (a version / event-time column), NOT by
  *    schema-order struct comparison. Collapse is
  *    `max(struct(orderCol, rest…))` per key — orderCol decides,
  *    remaining columns break exact ties deterministically.
  *
  *  - '''Atomic publish.''' Each merge writes a fresh versioned data
  *    directory, then publishes it by atomically replacing ONE commit
  *    file (`_commit`, temp-write + `ATOMIC_MOVE`) that names the live
  *    directory, the committed batch id, and the checkpoint lineage.
  *    A crash at any point leaves the previous `_commit` — and thus
  *    the previous table version — fully intact; the replayed batch
  *    simply re-writes its version directory and re-publishes.
  *    (The previous two-`renameTo` swap had a window with NO current
  *    directory; a replay in that window silently truncated the table.)
  *
  *  - '''Replay guard is lineage-scoped.''' Spark batchIds are only
  *    meaningful within one checkpoint; a fresh checkpoint restarts at
  *    0. The guard therefore skips a batch only when BOTH the recorded
  *    checkpoint lineage matches this query's checkpoint AND
  *    `batchId <= committed` — a genuine crash-replay (same
  *    checkpoint, same ids) is skipped, while pointing a new stream
  *    (new checkpoint) at an existing table applies every batch
  *    instead of silently dropping data until ids catch up.
  *
  * At 100 TB the merge cost is one full-outer join per trigger against
  * the dimension (small by definition — facts stream, dims upsert).
  * Delta/Iceberg deployments replace the versioned-dir + pointer with
  * MERGE INTO + txn versions — same dataflow, same guard semantics.
  */
object UpsertSink {

  private final case class Commit(lineage: String, batchId: Long, dir: String)

  private def commitPath(tableDir: String) = Paths.get(tableDir, "_commit")

  private def readCommit(tableDir: String): Option[Commit] = {
    val p = commitPath(tableDir)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), UTF_8).split("\n", 3) match {
      case Array(lin, id, dir) => Some(Commit(lin, id.trim.toLong, dir.trim))
      case _                   => None
    }
  }

  /** Publish atomically: temp-write the commit record, ATOMIC_MOVE it
    * over `_commit`. Throws (rather than silently no-ops) on failure. */
  private def writeCommit(tableDir: String, c: Commit): Unit = {
    val tmp = Paths.get(tableDir, s"_commit.tmp")
    Files.write(tmp, s"${c.lineage}\n${c.batchId}\n${c.dir}".getBytes(UTF_8))
    Files.move(tmp, commitPath(tableDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Resolve the live table version (what `$tableDir/current` used to
    * be, minus the non-atomic swap). Empty option = no commit yet. */
  def currentDir(tableDir: String): Option[String] =
    readCommit(tableDir).map(c => s"$tableDir/${c.dir}")

  /** Read the live version of a maintained table. */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(currentDir(tableDir).getOrElse(
      sys.error(s"no committed version under $tableDir")))

  /** Time travel: retained versions of the table, newest (by commit
    * time) last, as (batchId, path). With `keepVersions` > 1 on
    * [[maintain]], the versioned-dir layout doubles as a snapshot
    * history — the poor man's Delta time travel, same read path.
    * Ordering is commit recency (mtime), not batchId: ids restart per
    * checkpoint lineage, so they only order versions WITHIN one. */
  def versions(tableDir: String): Seq[(Long, String)] =
    Option(new java.io.File(tableDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
      .sortBy(f => (f.lastModified, f.getName))
      .flatMap { f =>
        f.getName.split("_").lastOption.flatMap(s =>
          scala.util.Try(s.toLong).toOption).map(_ -> s"$tableDir/${f.getName}")
      }

  /** Read the newest retained version with batchId ≤ `asOfBatch`. */
  def readAsOf(spark: SparkSession, tableDir: String, asOfBatch: Long): DataFrame = {
    val vs = versions(tableDir).filter(_._1 <= asOfBatch)
    require(vs.nonEmpty, s"no retained version ≤ batch $asOfBatch under $tableDir")
    spark.read.parquet(vs.last._2)
  }

  /** One checkpoint directory = one batchId lineage. */
  private def lineageKey(checkpointDir: String): String =
    Paths.get(checkpointDir).toAbsolutePath.normalize.toString

  /** Start maintaining `tableDir` (parquet, keyed by `keys`) from
    * `updates`; within-batch last-write-wins is decided by `orderCol`
    * (version / event-time — must be a non-key column of `updates`).
    * `availableNow = true` drains the backlog and stops (backfill
    * mode); `false` keeps a live micro-batch loop (caller stops). */
  def maintain(spark: SparkSession, updates: DataFrame, tableDir: String,
      checkpointDir: String, keys: Seq[String], orderCol: String,
      availableNow: Boolean = true, keepVersions: Int = 1): StreamingQuery = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    require(updates.columns.contains(orderCol) && !keys.contains(orderCol),
      s"orderCol '$orderCol' must be a non-key column of the updates stream")
    val lineage = lineageKey(checkpointDir)
    // explicit Scala function type disambiguates the foreachBatch
    // overloads (Scala lambda vs Java VoidFunction2)
    val mergeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      val committed = readCommit(tableDir)
      val skip = committed.exists(c => c.lineage == lineage && batchId <= c.batchId)
      if (!skip) {
        val s = batch.sparkSession
        new java.io.File(tableDir).mkdirs()
        val existing = currentDir(tableDir) match {
          case Some(d) => s.read.parquet(d)
          case None    => batch.limit(0)
        }
        // collapse to latest row per key: orderCol first in the struct
        // so it alone decides; remaining columns are a deterministic
        // tiebreak for exact orderCol ties
        val nonKeys = batch.columns.filterNot(keys.contains)
        val ordered = orderCol +: nonKeys.filterNot(_ == orderCol)
        val latest = batch.groupBy(keys.map(col): _*)
          .agg(max(struct(ordered.map(col): _*)).as("_v"))
          .select(keys.map(col) ++ nonKeys.map(c => col(s"_v.$c").as(c)): _*)
        val merged = graft.sources.Dims.upsert(existing, latest, keys)
        // versioned dir, lineage-scoped so replays overwrite their own
        val newDir = s"v_${Integer.toHexString(lineage.hashCode)}_$batchId"
        merged.write.mode("overwrite").parquet(s"$tableDir/$newDir")
        writeCommit(tableDir, Commit(lineage, batchId, newDir))
        // GC superseded versions beyond the retention window; failures
        // leave harmless garbage
        val retained = versions(tableDir).takeRight(keepVersions)
          .map(_._2.substring(tableDir.length + 1)).toSet + newDir
        Option(new java.io.File(tableDir).listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("v_") &&
            !retained.contains(f.getName))
          .foreach(d => scala.util.Try(
            org.apache.commons.io.FileUtils.deleteDirectory(d)))
      } // else: same-lineage replay of an absorbed batch — idempotent skip
    }
    // The replay guard intentionally does NOT execute a replayed
    // batch's plan. With a STATEFUL updates stream (e.g. LiveMerge →
    // maintain), Spark 4.1's state-store commit validation fails the
    // query on exactly that legitimate skip (0 commits reported for the
    // skipped batch) — and it also races the final batch's async commit
    // reports under foreachBatch. Queries started here therefore run
    // without it; the commit-file protocol above is the exactly-once
    // mechanism for this sink. (Runtime conf: affects queries started
    // after, the same pattern LiveMerge.merged uses for its provider.)
    spark.conf.set(
      "spark.sql.streaming.stateStore.commitValidation.enabled", "false")
    val w = updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(mergeBatch)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
