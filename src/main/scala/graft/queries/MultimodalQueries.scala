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

  /** Pre-warm the write-once media fixture and all three decoded-matrix
    * dumps. The scan census calls this BEFORE counting: on a cold tmpdir
    * the first gate to touch a dump otherwise pays the fixture-generation
    * and dump-write jobs, whose scans get charged to that gate and trip
    * the ratchet spuriously (r10 ADVICE). Idempotent; no-op when warm. */
  def prewarmArtifacts(spark: SparkSession): Unit = {
    mediaTable(spark)
    ensurePixelDump(spark)
    ensureVframeDump(spark)
    ensureAudioDump(spark)
    ()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Engine-written decoded-matrix artifact (the unigram-model oracle
    * pattern, r9): every image payload the engine decodes is dumped
    * exploded as (media_id, width, height, channels, i, px) integer
    * rows, so DuckDB can replay the PIXEL MATH (resize mapping, dHash
    * Hamming buckets, feature stats) over byte-identical input — only
    * the container decode itself stays engine-side (JDK codecs have no
    * SQL spelling; that seam is MultimodalSpec's). Content is a pure
    * function of (FixtureVersion, FixtureRows), so the same write-once
    * staging+rename discipline as [[mediaTable]] applies and repeat
    * gate runs skip the write (bench-comparability: only the first run
    * per tmpdir pays it). */
  private def pixelDumpDir: java.io.File = new java.io.File(
    new java.io.File(sys.props("java.io.tmpdir")),
    s"graft-media-pixels-v$FixtureVersion-$FixtureRows.parquet")

  private def ensurePixelDump(s: SparkSession): String = {
    import Multimodal._
    val dir = pixelDumpDir
    val ok = new java.io.File(dir, "_SUCCESS")
    if (!ok.exists()) {
      val staging = new java.io.File(dir.getParentFile,
        s"${dir.getName}.staging-${ProcessHandle.current().pid()}")
      val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
      decodeImages(media)
        .flatMap { img =>
          img.pixels.iterator.zipWithIndex.map { case (b, i) =>
            (img.media_id, img.width, img.height, img.channels, i, b & 0xff)
          }
        }(org.apache.spark.sql.Encoders.product[(Long, Int, Int, Int, Int, Int)])
        .toDF("media_id", "width", "height", "channels", "i", "px")
        .repartition(4)
        .write.mode("overwrite").parquet(staging.getAbsolutePath)
      if (!staging.renameTo(dir)) deleteRecursively(staging)
    }
    dir.getAbsolutePath
  }
  private val pxRel =
    s"(SELECT * FROM read_parquet('${pixelDumpDir.getAbsolutePath}/*.parquet'))"

  /** Video sibling of the pixel dump: every decoded video frame
    * exploded as (media_id, frame_index, n_px, i, px) with i the
    * WITHIN-FRAME pixel index — so frame sampling, digests, and the
    * frame-vs-predecessor MAD all have a DuckDB spelling. */
  private def vframeDumpDir: java.io.File = new java.io.File(
    new java.io.File(sys.props("java.io.tmpdir")),
    s"graft-media-vframes-v$FixtureVersion-$FixtureRows.parquet")

  private def ensureVframeDump(s: SparkSession): String = {
    import Multimodal._
    val dir = vframeDumpDir
    val ok = new java.io.File(dir, "_SUCCESS")
    if (!ok.exists()) {
      val staging = new java.io.File(dir.getParentFile,
        s"${dir.getName}.staging-${ProcessHandle.current().pid()}")
      val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
      sampleFrames(media, everyN = 1) // every frame: the dump is the matrix
        .flatMap { fr =>
          fr.pixels.iterator.zipWithIndex.map { case (b, i) =>
            (fr.media_id, fr.frameIndex, fr.pixels.length, i, b & 0xff)
          }
        }(org.apache.spark.sql.Encoders.product[(Long, Int, Int, Int, Int)])
        .toDF("media_id", "frame_index", "n_px", "i", "px")
        .repartition(2)
        .write.mode("overwrite").parquet(staging.getAbsolutePath)
      if (!staging.renameTo(dir)) deleteRecursively(staging)
    }
    dir.getAbsolutePath
  }
  private val vfRel =
    s"(SELECT * FROM read_parquet('${vframeDumpDir.getAbsolutePath}/*.parquet'))"

  /** Audio sibling: decoded PCM exploded as (media_id, sample_rate,
    * n_samples, i, s). */
  private def audioDumpDir: java.io.File = new java.io.File(
    new java.io.File(sys.props("java.io.tmpdir")),
    s"graft-media-audio-v$FixtureVersion-$FixtureRows.parquet")

  private def ensureAudioDump(s: SparkSession): String = {
    import Multimodal._
    val dir = audioDumpDir
    val ok = new java.io.File(dir, "_SUCCESS")
    if (!ok.exists()) {
      val staging = new java.io.File(dir.getParentFile,
        s"${dir.getName}.staging-${ProcessHandle.current().pid()}")
      val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
      decodeAudio(media)
        .flatMap { a =>
          a.samples.iterator.zipWithIndex.map { case (v, i) =>
            (a.media_id, a.sampleRate, a.samples.length, i, v.toInt)
          }
        }(org.apache.spark.sql.Encoders.product[(Long, Int, Int, Int, Int)])
        .toDF("media_id", "sample_rate", "n_samples", "i", "s")
        .repartition(2)
        .write.mode("overwrite").parquet(staging.getAbsolutePath)
      if (!staging.renameTo(dir)) deleteRecursively(staging)
    }
    dir.getAbsolutePath
  }
  private val auRel =
    s"(SELECT * FROM read_parquet('${audioDumpDir.getAbsolutePath}/*.parquet'))"

  /** decode → per-channel integer feature stats over the engine-
    * decoded matrix, in the exact cross-engine currency: micro-unit
    * floor-divided mean and variance (the KmeansStep pattern — long
    * sums are exact, n·Σx²−(Σx)² keeps the variance numerator integer,
    * floor-div puts the quotient on a grid both engines agree on).
    * Float mean/std stay on [[Multimodal.imageFeatures]] under
    * MultimodalSpec. */
  private val features: Q = (s, _) => {
    val path = ensurePixelDump(s)
    s.read.parquet(path)
      .groupBy(col("media_id"), (col("i") % col("channels")).cast("long").as("channel"))
      .agg(max("width").as("width"), max("height").as("height"),
        sum(col("px")).as("sp"),
        sum(col("px") * col("px")).as("qp"),
        count(lit(1)).as("n_px"))
      .select(col("media_id"), col("channel"), col("width"), col("height"),
        col("n_px"),
        expr("sp * 1000000L div n_px").as("mean_e6"),
        // decimal(38,0) keeps the variance numerator exact past the
        // ~16k-pixels-per-channel point where n_px*qp - sp*sp wraps
        // Long; `div` is EXACT integral division on the decimals
        // (non-negative by Cauchy–Schwarz, so trunc == floor) — the
        // earlier floor(decimal /) form rounded the decimal(38,6)
        // quotient HALF_UP first, which could round a value sitting
        // <5e-7 below an integer up across it and disagree with the
        // oracle's truncating `//` by 1
        expr("""(cast(n_px as decimal(38,0)) * qp - cast(sp as decimal(38,0)) * sp)
                * 1000000 div (cast(n_px as decimal(38,0)) * n_px)""")
          .as("var_e6"))
      .orderBy(col("media_id"), col("channel"))
  }
  private val featuresSql: String =
    s"""WITH px AS $pxRel
       |SELECT media_id, CAST(i % channels AS BIGINT) AS channel,
       |  max(width) AS width, max(height) AS height,
       |  count(*) AS n_px,
       |  (SUM(px)::BIGINT * 1000000) // count(*) AS mean_e6,
       |  CAST((count(*)::HUGEINT * SUM(px*px)::HUGEINT
       |         - SUM(px)::HUGEINT * SUM(px)::HUGEINT)
       |    * 1000000 // (count(*)::HUGEINT * count(*)) AS BIGINT) AS var_e6
       |FROM px GROUP BY 1, 2""".stripMargin

  /** decode → nearest-neighbor resize to 8×8 → md5 digest of the
    * unsigned-pixel CSV, one row per image — the resize KERNEL runs
    * live in the engine; the DuckDB oracle replays the same integer
    * src-index mapping over the dumped decoded matrix. */
  private val resized: Q = (s, _) => {
    import Multimodal._
    ensurePixelDump(s)
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    resize(decodeImages(media), 8, 8)
      .map { img =>
        (img.media_id, img.pixels.length.toLong,
          img.pixels.iterator.map(b => (b & 0xff).toString).mkString(","))
      }(org.apache.spark.sql.Encoders.product[(Long, Long, String)])
      .toDF("media_id", "n_px", "pxs")
      .select(col("media_id"), col("n_px"),
        md5(col("pxs").cast("binary")).as("pixels_md5"))
      .orderBy(col("media_id"))
  }
  private val resizedSql: String =
    s"""WITH px AS $pxRel,
       |m AS (SELECT DISTINCT media_id, width, height, channels FROM px),
       |grid AS (
       |  SELECT m.media_id,
       |    (ty.y*8 + tx.x)*m.channels + tc.c AS dst_i,
       |    (((ty.y*m.height) // 8)*m.width + ((tx.x*m.width) // 8))
       |      *m.channels + tc.c AS src_i
       |  FROM m, range(8) ty(y), range(8) tx(x), range(4) tc(c)
       |  WHERE tc.c < m.channels)
       |SELECT g.media_id, count(*) AS n_px,
       |  md5(string_agg(p.px::VARCHAR, ',' ORDER BY g.dst_i)) AS pixels_md5
       |FROM grid g JOIN px p ON p.media_id = g.media_id AND p.i = g.src_i
       |GROUP BY 1""".stripMargin

  /** video frame-sampling: every 2nd frame, with per-frame md5 digests
    * of the unsigned-pixel CSV (the resize currency) — the sampler runs
    * live; DuckDB replays sampling + digest over the frame dump. */
  private val frames: Q = (s, _) => {
    import Multimodal._
    ensureVframeDump(s)
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    sampleFrames(media, everyN = 2)
      .map { fr =>
        (fr.media_id, fr.frameIndex, fr.pixels.length.toLong,
          fr.pixels.iterator.map(b => (b & 0xff).toString).mkString(","))
      }(org.apache.spark.sql.Encoders.product[(Long, Int, Long, String)])
      .toDF("media_id", "frame_index", "n_px", "pxs")
      .select(col("media_id"), col("frame_index"), col("n_px"),
        md5(col("pxs").cast("binary")).as("pixels_md5"))
      .orderBy(col("media_id"), col("frame_index"))
  }
  private val framesSql: String =
    s"""WITH vf AS $vfRel
       |SELECT media_id, CAST(frame_index AS INT) AS frame_index,
       |  count(*) AS n_px,
       |  md5(string_agg(px::VARCHAR, ',' ORDER BY i)) AS pixels_md5
       |FROM vf WHERE frame_index % 2 = 0
       |GROUP BY 1, 2""".stripMargin

  /** audio decode → integer-exact waveform stats (peak / zero
    * crossings / Σs² / floor-div micro-second duration); float RMS
    * stays on [[Multimodal.audioFeatures]] under MultimodalSpec. */
  private val audio: Q = (s, _) => {
    import Multimodal._
    ensureAudioDump(s)
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    audioStats(decodeAudio(media)).toDF()
      .orderBy(col("media_id"))
  }
  private val audioSql: String =
    s"""WITH au AS $auRel,
       |zc AS (
       |  SELECT a.media_id,
       |    SUM(CASE WHEN (b.s < 0) <> (a.s < 0) THEN 1 ELSE 0 END) AS z
       |  FROM au a JOIN au b
       |    ON b.media_id = a.media_id AND b.i = a.i - 1
       |  GROUP BY 1)
       |SELECT media_id, max(sample_rate) AS sample_rate,
       |  count(*) AS n_samples,
       |  (count(*) * 1000000) // max(sample_rate) AS dur_us,
       |  CAST(max(abs(s)) AS INT) AS peak,
       |  CAST(COALESCE(max(zc.z), 0) AS BIGINT) AS zero_crossings,
       |  SUM(s::BIGINT * s)::BIGINT AS sq_sum
       |FROM au LEFT JOIN zc USING (media_id)
       |GROUP BY 1""".stripMargin

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

  /** Fixed-point integer Goertzel twin of `multimodal_spectral` — the
    * cross-engine witness for the float recurrence (the last compute
    * gate without one, r10 verdict item 1). The engine runs the REAL
    * decode → [[Multimodal.audioSpectralQuantized]] i64 recurrence;
    * DuckDB replays the identical fold over the dumped PCM artifact
    * via `list_reduce` with a [s1, s2] list accumulator (the
    * ml_pca_project pattern), using the SAME Scala-computed quantized
    * coefficients interpolated as literals. Truncating division on
    * both sides (Java long `/` ≡ DuckDB `//`). */
  // 256 (vs the float gate's 512) so EVERY fixture audio row has at
  // least one whole frame — the witness covers the full corpus, not
  // just the longest clips (fixture n_samples ranges 261..555)
  private val spectralQFrame = 256
  private val spectralQBands = 8
  private val spectralQScale = 1L << 20
  private val spectralQ: Q = (s, _) => {
    import Multimodal._
    ensureAudioDump(s)
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    audioSpectralQuantized(decodeAudio(media),
        spectralQFrame, spectralQBands, spectralQScale)
      .toDF()
      .orderBy(col("media_id"), col("band"))
  }
  private val spectralQSql: String = {
    val fs = spectralQFrame
    val q = spectralQScale
    val bandsVals = Multimodal
      .goertzelCoeffsQ(fs, spectralQBands, q).zipWithIndex
      .map { case (c, b) => s"($b, CAST($c AS BIGINT))" }.mkString(", ")
    s"""WITH au AS $auRel,
       |frames AS (
       |  SELECT media_id, i // $fs AS frame, i % $fs AS j, CAST(s AS BIGINT) AS v
       |  FROM au WHERE i < (n_samples // $fs) * $fs),
       |flists AS (
       |  SELECT media_id, frame,
       |    list_transform(list(v ORDER BY j), e -> [e, CAST(0 AS BIGINT)]) AS xs
       |  FROM frames GROUP BY 1, 2),
       |bands(band, cq) AS (VALUES $bandsVals),
       |folded AS (
       |  SELECT media_id, band, cq,
       |    list_reduce(list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)], xs),
       |      (acc, x) -> [x[1] + (cq * acc[1]) // $q - acc[2], acc[1]]) AS st
       |  FROM flists, bands),
       |fe AS (
       |  SELECT media_id, band,
       |    st[1]*st[1] + st[2]*st[2] - ((cq * st[1]) // $q) * st[2] AS ef
       |  FROM folded)
       |SELECT media_id, CAST(band AS INT) AS band,
       |  CAST(count(*) AS INT) AS n_frames,
       |  CAST(SUM(ef) AS BIGINT) AS energy_q
       |FROM fe GROUP BY 1, 2 ORDER BY media_id, band""".stripMargin
  }

  /** keyframe/scene-change detection: frame-vs-predecessor MAD in
    * exact micro-units ([[Multimodal.keyframesMicro]]); the DuckDB
    * mirror self-joins consecutive frames of the dump on the
    * within-frame pixel index. */
  private val keyframesQ: Q = (s, _) => {
    import Multimodal._
    ensureVframeDump(s)
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    keyframesMicro(media, threshold = 64L).toDF()
      .orderBy(col("media_id"), col("frame_index"))
  }
  private val keyframesSql: String =
    s"""WITH vf AS $vfRel,
       |mad AS (
       |  SELECT a.media_id, a.frame_index,
       |    SUM(abs(a.px - b.px))::BIGINT AS sad, max(a.n_px) AS n_px
       |  FROM vf a JOIN vf b
       |    ON b.media_id = a.media_id AND b.frame_index = a.frame_index - 1
       |    AND b.i = a.i
       |  WHERE a.frame_index > 0
       |  GROUP BY 1, 2)
       |SELECT media_id, CAST(frame_index AS INT) AS frame_index,
       |  (sad * 1000000) // n_px AS mad_e6
       |FROM mad WHERE sad > 64 * n_px
       |UNION ALL
       |SELECT DISTINCT media_id, 0 AS frame_index, 0::BIGINT AS mad_e6
       |FROM vf""".stripMargin

  /** perceptual-hash image dedup: dHash fingerprints → pigeonhole-
    * blocked hamming pairs (the image twin of dedup_simhash; catches
    * the same picture under different containers/resolutions where
    * byte-level dedup sees distinct blobs). */
  private val phashDedup: Q = (s, _) => {
    import Multimodal._
    ensurePixelDump(s)
    val media = mediaTable(s).as[MediaRow](org.apache.spark.sql.Encoders.product[MediaRow])
    imageNearDuplicates(media, maxDist = 4)
      .orderBy(col("media_a"), col("media_b"))
  }
  /** DuckDB mirror of dHash → Hamming pairs over the dumped decoded
    * matrix: 9×8 box-average cells by the same integer floor division,
    * adjacent-cell bits assembled as two 32-bit halves (DuckDB rejects
    * a shift into the BIGINT sign bit, which bit 63 would need; the
    * Hamming distance of the halves equals the 64-bit distance), then
    * BRUTE-FORCE all-pairs — so a hash match also proves the engine's
    * pigeonhole blocked join loses no pair (the SimHash oracle
    * convention). */
  private val phashDedupSql: String =
    s"""WITH px AS $pxRel,
       |m AS (SELECT DISTINCT media_id, width, height, channels FROM px),
       |pc AS (SELECT media_id, px, i // (width*channels) AS y,
       |              (i // channels) % width AS x FROM px),
       |cr AS (
       |  SELECT m.media_id, gy.g AS gy, gx.g AS gx, m.channels AS channels,
       |    (gy.g*m.height) // 8 AS y0,
       |    greatest((gy.g*m.height) // 8 + 1, ((gy.g+1)*m.height) // 8) AS y1,
       |    (gx.g*m.width) // 9 AS x0,
       |    greatest((gx.g*m.width) // 9 + 1, ((gx.g+1)*m.width) // 9) AS x1
       |  FROM m, range(8) gy(g), range(9) gx(g)),
       |cells AS (
       |  SELECT c.media_id, c.gy, c.gx,
       |    (SUM(p.px)::BIGINT) // ((c.y1-c.y0)*(c.x1-c.x0)*c.channels) AS cell
       |  FROM cr c JOIN pc p ON p.media_id = c.media_id
       |    AND p.y >= c.y0 AND p.y < c.y1 AND p.x >= c.x0 AND p.x < c.x1
       |  GROUP BY c.media_id, c.gy, c.gx, c.y0, c.y1, c.x0, c.x1, c.channels),
       |bits AS (
       |  SELECT l.media_id,
       |    SUM(CASE WHEN l.cell < r.cell AND l.gy*8 + l.gx < 32
       |        THEN 1::BIGINT << (l.gy*8 + l.gx) ELSE 0 END) AS lo,
       |    SUM(CASE WHEN l.cell < r.cell AND l.gy*8 + l.gx >= 32
       |        THEN 1::BIGINT << (l.gy*8 + l.gx - 32) ELSE 0 END) AS hi
       |  FROM cells l JOIN cells r ON r.media_id = l.media_id
       |    AND r.gy = l.gy AND r.gx = l.gx + 1
       |  WHERE l.gx < 8
       |  GROUP BY 1)
       |SELECT a.media_id AS media_a, b.media_id AS media_b,
       |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT)
       |    AS hamming
       |FROM bits a JOIN bits b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 4""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("multimodal_features", features, Some(featuresSql)),
    ("multimodal_resize", resized, Some(resizedSql)),
    ("multimodal_frames", frames, Some(framesSql)),
    ("multimodal_audio", audio, Some(audioSql)),
    ("multimodal_keyframes", keyframesQ, Some(keyframesSql)),
    ("multimodal_spectral", spectral, None),
    ("multimodal_spectral_q", spectralQ, Some(spectralQSql)),
    ("multimodal_phash_dedup", phashDedup, Some(phashDedupSql))
  )
}
