package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import QueryDsl.Q

/** Multimodal gate queries: a deterministic binary-payload parquet
  * fixture mixing REAL PNG/WAV containers (decoded by the JDK codecs)
  * with stub-format rows (the seam for codecs the JDK lacks) is
  * materialized once into the local tmp area, then the declared
  * queries run the REAL pipeline over a REAL parquet scan: binary
  * column + typed metadata → narrow decode →
  * resize/features/frame-sample. Rows-only gate (pixel math is not
  * SQL-expressible); kernel exactness is covered by MultimodalSpec.
  */
object MultimodalQueries {

  private val FixtureRows = 300
  // bump when syntheticMedia's generation changes — the fixture is
  // cached by path, so content changes need a fresh directory
  private val FixtureVersion = 3

  /** Write-once deterministic media table (payload binary + meta
    * struct). Safe across concurrent JVMs (bench + correctness driver
    * can race here): each process writes to a PID-unique staging dir,
    * then atomically renames into the shared path — the loser of the
    * rename discards its staging copy and reads the winner's (content
    * depends only on (version, n), so both copies are identical). */
  def mediaTable(spark: SparkSession, n: Int = FixtureRows): DataFrame = {
    val base = new java.io.File(sys.props("java.io.tmpdir"))
    val dir = new java.io.File(base, s"graft-media-v$FixtureVersion-$n.parquet")
    val ok = new java.io.File(dir, "_SUCCESS")
    if (!ok.exists()) {
      val staging = new java.io.File(base,
        s"graft-media-v$FixtureVersion-$n.staging-${ProcessHandle.current().pid()}")
      Multimodal.syntheticMedia(spark, n)
        .repartition(4) // fixture-size files; real tables size by bytes
        .write.mode("overwrite").parquet(staging.getAbsolutePath)
      if (!staging.renameTo(dir)) deleteRecursively(staging)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** decode → per-channel mean/std features, one row per (media,
    * channel) — flat deterministic schema for the gate dump. */
  private val features: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    imageFeatures(decodeImages(media)).toDF()
      .select(col("media_id"), col("width"), col("height"),
        posexplode(arrays_zip(col("mean"), col("std"))).as(Seq("channel", "ms")))
      .select(col("media_id"), col("width"), col("height"), col("channel"),
        round(col("ms.mean").cast("double"), 4).as("mean_px"),
        round(col("ms.std").cast("double"), 4).as("std_px"))
      .orderBy(col("media_id"), col("channel"))
  }

  /** decode → nearest-neighbor resize to 8×8 → payload checksum, one
    * row per image (the resize kernel under a scan, not a unit test). */
  private val resized: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    resize(decodeImages(media), 8, 8).toDF()
      .select(col("media_id"), col("width"), col("height"),
        crc32(col("pixels")).as("pixel_crc"), length(col("pixels")).as("n_bytes"))
      .orderBy(col("media_id"))
  }

  /** video frame-sampling: every 2nd frame, with per-frame checksums. */
  private val frames: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    sampleFrames(media, everyN = 2).toDF()
      .select(col("media_id"), col("frameIndex").as("frame_index"),
        crc32(col("pixels")).as("pixel_crc"), length(col("pixels")).as("n_bytes"))
      .orderBy(col("media_id"), col("frame_index"))
  }

  /** audio decode → waveform features (RMS/peak/zero-crossings). */
  private val audio: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    audioFeatures(decodeAudio(media)).toDF()
      .select(col("media_id"), col("sampleRate").as("sample_rate"),
        col("nSamples").as("n_samples"),
        round(col("durationMs"), 3).as("duration_ms"),
        round(col("rms"), 4).as("rms"), col("peak"),
        col("zeroCrossings").as("zero_crossings"))
      .orderBy(col("media_id"))
  }

  /** audio decode → Goertzel band energies (8 bands to Nyquist),
    * exploded per band with 6-dp rounding for a stable dump. */
  private val spectral: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    audioSpectral(decodeAudio(media)).toDF()
      .select(col("media_id"), col("nFrames").as("n_frames"),
        col("dominantBand").as("dominant_band"),
        posexplode(col("bandEnergy")).as(Seq("band", "energy")))
      .select(col("media_id"), col("n_frames"), col("dominant_band"),
        col("band"), round(col("energy"), 6).as("energy"))
      .orderBy(col("media_id"), col("band"))
  }

  /** keyframe/scene-change detection: frame-vs-predecessor MAD with
    * 4-dp rounding for a stable dump. */
  private val keyframesQ: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    keyframes(media, threshold = 64.0).toDF()
      .select(col("media_id"), col("frameIndex").as("frame_index"),
        round(col("mad"), 4).as("mad"))
      .orderBy(col("media_id"), col("frame_index"))
  }

  /** perceptual-hash image dedup: dHash fingerprints → pigeonhole-
    * blocked hamming pairs (the image twin of dedup_simhash; catches
    * the same picture under different containers/resolutions where
    * byte-level dedup sees distinct blobs). */
  private val phashDedup: Q = (s, _) => {
    import Multimodal._
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    imageNearDuplicates(media, maxDist = 4)
      .orderBy(col("media_a"), col("media_b"))
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("multimodal_features", features, None),
    ("multimodal_resize", resized, None),
    ("multimodal_frames", frames, None),
    ("multimodal_audio", audio, None),
    ("multimodal_keyframes", keyframesQ, None),
    ("multimodal_spectral", spectral, None),
    ("multimodal_phash_dedup", phashDedup, None)
  )
}
