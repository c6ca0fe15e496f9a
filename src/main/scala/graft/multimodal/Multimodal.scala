package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque binary payloads with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, partition-size control,
  * typed mapPartitions batching (the Scala-native equivalent of
  * mapInPandas: one JVM pass per partition, zero per-row UDF setup) —
  * and so is the codec for the formats the JDK itself ships:
  * [[JdkCodec]] decodes real PNG (ImageIO, also JPEG/BMP) and real
  * PCM16 WAV (javax.sound) payloads, dispatched by magic bytes.
  * [[StubCodec]] remains the clearly marked seam for codecs the JDK
  * lacks (H.264 video, MP3, …) — swapping in e.g. ffmpeg bindings
  * changes only that object.
  *
  * Scale notes: payloads never pass through a shuffle — operators are
  * narrow mapPartitions; when a shuffle is unavoidable upstream,
  * repartition by media_id FIRST and rely on
  * spark.sql.files.maxPartitionBytes to bound scan-partition memory
  * (payload rows are MBs, not KBs — size partitions by bytes, not rows).
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  case class MediaMeta(width: Int, height: Int, channels: Int,
      sampleRate: Int, durationMs: Int, format: String)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)

  case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, pixels: Array[Byte])

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      mean: Array[Float], std: Array[Float])

  case class VideoFrame(media_id: Long, frameIndex: Int, pixels: Array[Byte])
  case class Keyframe(media_id: Long, frameIndex: Int, mad: Double)

  case class DecodedAudio(media_id: Long, sampleRate: Int, samples: Array[Short])

  case class AudioFeatures(media_id: Long, sampleRate: Int, nSamples: Int,
      durationMs: Double, rms: Double, peak: Int, zeroCrossings: Int)

  case class AudioSpectral(media_id: Long, sampleRate: Int, nFrames: Int,
      dominantBand: Int, bandEnergy: Array[Double])

  case class AudioSpectralQ(media_id: Long, band: Int, n_frames: Int,
      energy_q: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sampleRate", IntegerType, nullable = false),
      StructField("durationMs", IntegerType, nullable = false),
      StructField("format", StringType, nullable = false))), nullable = false)))

  /** STUB codec — deterministic fake media format standing in for real
    * image/audio libraries (absent in this container). Layout:
    * [magic 'G' 'M'][width i32 LE][height i32 LE][channels u8][pixel bytes…]
    * where pixel (x, y, c) = splitmix-style mix of (media-id-free)
    * coordinates, so decode is reproducible anywhere. A real deployment
    * replaces encode/decode with e.g. javax.imageio / ffmpeg bindings.
    */
  object StubCodec {
    def encode(width: Int, height: Int, channels: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(11 + width * height * channels)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('G'.toByte).put('M'.toByte)
      out.putInt(width).putInt(height).put(channels.toByte)
      var i = 0
      val n = width * height * channels
      while (i < n) {
        out.put((((i * 2654435761L) >>> 24) & 0xff).toByte)
        i += 1
      }
      out.array()
    }

    /** Audio layout: [magic 'G' 'A'][sampleRate i32 LE][numSamples i32
      * LE][PCM16 LE samples…], sample(i) = deterministic mix of i. */
    def encodeAudio(sampleRate: Int, numSamples: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(10 + numSamples * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('G'.toByte).put('A'.toByte)
      out.putInt(sampleRate).putInt(numSamples)
      var i = 0
      while (i < numSamples) {
        out.putShort((((i * 2654435761L) >>> 16) & 0xffff).toShort)
        i += 1
      }
      out.array()
    }

    def decodeAudio(payload: Array[Byte]): Option[(Int, Array[Short])] = {
      if (payload == null || payload.length < 10 ||
        payload(0) != 'G'.toByte || payload(1) != 'A'.toByte) return None
      val b = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rate = b.getInt(2); val n = b.getInt(6)
      if (rate <= 0 || n < 0 || payload.length < 10 + n * 2) None
      else {
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = b.getShort(10 + i * 2); i += 1 }
        Some((rate, samples))
      }
    }

    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (payload == null || payload.length < 11 ||
        payload(0) != 'G'.toByte || payload(1) != 'M'.toByte) return None
      val b = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = b.getInt(2); val h = b.getInt(6); val c = payload(10).toInt
      if (w <= 0 || h <= 0 || c <= 0 || payload.length < 11 + w * h * c) None
      else Some((w, h, c, java.util.Arrays.copyOfRange(payload, 11, 11 + w * h * c)))
    }
  }

  /** REAL codec for the formats the JDK ships: PNG (and JPEG/BMP)
    * through `javax.imageio`, WAV PCM16 through `javax.sound.sampled`.
    * No external libraries — this is a genuine decode of genuine
    * container formats, dispatched by magic bytes; [[StubCodec]]
    * remains the seam for codecs the JDK lacks (H.264, MP3, …). */
  object JdkCodec {
    private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

    def isPng(p: Array[Byte]): Boolean =
      p != null && p.length >= 4 && p.take(4).sameElements(PngMagic)

    def isJpeg(p: Array[Byte]): Boolean =
      p != null && p.length >= 2 && p(0) == 0xff.toByte && p(1) == 0xd8.toByte

    def isBmp(p: Array[Byte]): Boolean =
      p != null && p.length >= 2 && p(0) == 'B' && p(1) == 'M'

    /** Any container ImageIO can open here (PNG always; JPEG/BMP ship
      * with every JDK). */
    def isJdkImage(p: Array[Byte]): Boolean = isPng(p) || isJpeg(p) || isBmp(p)

    def isWav(p: Array[Byte]): Boolean =
      p != null && p.length >= 12 && p(0) == 'R' && p(1) == 'I' &&
        p(2) == 'F' && p(3) == 'F' && p(8) == 'W' && p(9) == 'A' &&
        p(10) == 'V' && p(11) == 'E'

    /** PNG/JPEG/BMP → (w, h, 3, RGB row-major bytes); None on corrupt. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val i = (y * w + x) * 3
              out(i) = ((rgb >> 16) & 0xff).toByte
              out(i + 1) = ((rgb >> 8) & 0xff).toByte
              out(i + 2) = (rgb & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some((w, h, 3, out))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** WAV → (sampleRate, PCM16 samples); None on corrupt/non-PCM16. */
    def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) { in.close(); None }
        else {
          val bytes = in.readAllBytes(); in.close()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val samples = new Array[Short](bytes.length / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(i * 2); i += 1 }
          Some((fmt.getSampleRate.toInt, samples))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Deterministic-content PNG (same pixel mix as the stub). */
    def encodePng(width: Int, height: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val base = (y * width + x) * 3
          def px(i: Int): Int = (((i * 2654435761L) >>> 24) & 0xff).toInt
          img.setRGB(x, y, (px(base) << 16) | (px(base + 1) << 8) | px(base + 2))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic-content PCM16 WAV (same sample mix as the stub). */
    def encodeWav(sampleRate: Int, numSamples: Int): Array[Byte] = {
      val pcm = new Array[Byte](numSamples * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < numSamples) {
        bb.putShort((((i * 2654435761L) >>> 16) & 0xffff).toShort)
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
        true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, numSamples.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** Magic-byte dispatch: real JDK codecs for PNG/JPEG/BMP/WAV
    * payloads, the stub for its own format, None (dropped) otherwise. */
  private[multimodal] def decodeAnyImage(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    if (JdkCodec.isJdkImage(p)) JdkCodec.decodeImage(p) else StubCodec.decode(p)

  private[multimodal] def decodeAnyAudio(p: Array[Byte]): Option[(Int, Array[Short])] =
    if (JdkCodec.isWav(p)) JdkCodec.decodeWav(p) else StubCodec.decodeAudio(p)

  /** Decode operator: batch-per-partition, malformed payloads dropped
    * (corrupt media must never kill a 100 TB job). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions(_.flatMap { row =>
        decodeAnyImage(row.payload).map { case (w, h, c, px) =>
          DecodedImage(row.media_id, w, h, c, px)
        }
      })
  }

  /** Nearest-neighbor resize — a real kernel over the (stub-decoded)
    * pixel grid. */
  def resize(images: Dataset[DecodedImage], outW: Int, outH: Int): Dataset[DecodedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions(_.map { img =>
      val out = new Array[Byte](outW * outH * img.channels)
      var y = 0
      while (y < outH) {
        val sy = y * img.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * img.width / outW
          var c = 0
          while (c < img.channels) {
            out((y * outW + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, outW, outH, img.channels, out)
    })
  }

  /** Per-channel mean/std feature extraction (real math, stub pixels) —
    * the embedding column for downstream similarity search. */
  def imageFeatures(images: Dataset[DecodedImage]): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions(_.map { img =>
      val c = img.channels
      val n = img.width * img.height
      val sum = new Array[Double](c); val sq = new Array[Double](c)
      var i = 0
      while (i < n * c) {
        val v = (img.pixels(i) & 0xff).toDouble
        sum(i % c) += v; sq(i % c) += v * v
        i += 1
      }
      val mean = Array.tabulate(c)(j => (sum(j) / n).toFloat)
      val std = Array.tabulate(c)(j =>
        math.sqrt(math.max(0.0, sq(j) / n - (sum(j) / n) * (sum(j) / n))).toFloat)
      ImageFeatures(img.media_id, img.width, img.height, mean, std)
    })
  }

  /** Difference-hash (dHash) perceptual image fingerprint: box-average
    * the grayscale image onto a (hashW+1)×hashH grid, then emit one bit
    * per adjacent-cell comparison (left < right) — 64 bits at the 8×8
    * default. Robust to re-encoding and mild resampling (box averages
    * move little), which is exactly what byte-level dedup misses: the
    * SAME picture saved as PNG and BMP, or thumbnailed, hashes to
    * nearby codes. All math is integer (Long pixel sums, floor
    * division) → bit-deterministic on any partitioning. Per-row narrow
    * kernel, same scale shape as the other decode ops. */
  def dHash(images: Dataset[DecodedImage], hashW: Int = 8, hashH: Int = 8):
      Dataset[(Long, Long)] = {
    require(hashW * hashH <= 64, "hash must fit in 64 bits")
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions(_.map { img =>
      val gw = hashW + 1
      val cells = Array.ofDim[Long](gw * hashH)
      var gy = 0
      while (gy < hashH) {
        val y0 = gy * img.height / hashH
        val y1 = math.max(y0 + 1, (gy + 1) * img.height / hashH)
        var gx = 0
        while (gx < gw) {
          val x0 = gx * img.width / gw
          val x1 = math.max(x0 + 1, (gx + 1) * img.width / gw)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              var c = 0
              while (c < img.channels) {
                sum += (img.pixels((y * img.width + x) * img.channels + c) & 0xff).toLong
                c += 1
              }
              x += 1
            }
            y += 1
          }
          cells(gy * gw + gx) =
            sum / ((y1 - y0).toLong * (x1 - x0) * img.channels)
          gx += 1
        }
        gy += 1
      }
      var bits = 0L
      var i = 0
      while (i < hashH * hashW) {
        val gy2 = i / hashW; val gx2 = i % hashW
        if (cells(gy2 * gw + gx2) < cells(gy2 * gw + gx2 + 1))
          bits |= 1L << i
        i += 1
      }
      (img.media_id, bits)
    }).toDF("media_id", "phash").as[(Long, Long)]
  }

  /** Perceptual near-duplicate image pairs: dHash signatures routed
    * through the SAME pigeonhole block join as text SimHash (hamming ≤
    * maxDist ⇒ at least one of maxDist+1 blocks matches exactly — the
    * blocked join provably loses no pair, see SimHash.nearPairs). At
    * 100 TB the shuffle carries (64-bit hash × blocks) per image, never
    * pixels. */
  def imageNearDuplicates(media: Dataset[MediaRow], maxDist: Int = 4): DataFrame =
    graft.text.SimHash.nearPairs(
      dHash(decodeImages(media)).toDF("doc_id", "simhash"), maxDist)
      .withColumnRenamed("doc_a", "media_a")
      .withColumnRenamed("doc_b", "media_b")

  /** Audio decode: batch-per-partition, malformed payloads dropped —
    * same narrow shape as image decode. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions(_.flatMap { row =>
        decodeAnyAudio(row.payload).map { case (rate, samples) =>
          DecodedAudio(row.media_id, rate, samples)
        }
      })
  }

  /** Waveform features (real math over stub PCM): RMS, peak amplitude,
    * zero-crossing count, duration — the audio analog of
    * [[imageFeatures]]. */
  def audioFeatures(audio: Dataset[DecodedAudio]): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.map { a =>
      val n = a.samples.length
      var sq = 0.0; var peak = 0; var zc = 0
      var i = 0
      while (i < n) {
        val v = a.samples(i).toInt
        sq += v.toDouble * v.toDouble
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((a.samples(i - 1) < 0) != (v < 0))) zc += 1
        i += 1
      }
      AudioFeatures(a.media_id, a.sampleRate, n,
        if (a.sampleRate > 0) n * 1000.0 / a.sampleRate else 0.0,
        if (n > 0) math.sqrt(sq / n) else 0.0, peak, zc)
    })
  }

  /** Per-band spectral energy via the Goertzel kernel — the cheap,
    * FFT-free way to get "how much energy near frequency f" for a
    * handful of bands (language/music/noise discrimination features).
    * Band b targets DFT bin round((b+0.5)·frameSize/(2·bands)) — band
    * centers spread evenly to Nyquist — and energies average over
    * whole `frameSize`-sample frames (the ragged tail is dropped).
    * All math is per-row sequential doubles: deterministic on any
    * partitioning, no cross-row sums. Narrow mapPartitions, same
    * scale shape as every other decode kernel here. */
  def audioSpectral(audio: Dataset[DecodedAudio], frameSize: Int = 512,
      bands: Int = 8): Dataset[AudioSpectral] = {
    require(frameSize > 0 && bands > 0 && bands * 2 <= frameSize)
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.map { a =>
      val nFrames = a.samples.length / frameSize
      val energy = new Array[Double](bands)
      var f = 0
      while (f < nFrames) {
        var b = 0
        while (b < bands) {
          val k = math.max(1,
            math.round((b + 0.5) * frameSize / (2.0 * bands)).toInt)
          val coeff = 2.0 * math.cos(2.0 * math.Pi * k / frameSize)
          var s1 = 0.0; var s2 = 0.0
          var i = f * frameSize
          val end = i + frameSize
          while (i < end) {
            val s0 = a.samples(i) / 32768.0 + coeff * s1 - s2
            s2 = s1; s1 = s0; i += 1
          }
          energy(b) += s1 * s1 + s2 * s2 - coeff * s1 * s2
          b += 1
        }
        f += 1
      }
      if (nFrames > 0) { var b = 0; while (b < bands) { energy(b) /= nFrames; b += 1 } }
      var dom = 0; var best = -1.0
      var b = 0
      while (b < bands) { if (energy(b) > best) { best = energy(b); dom = b }; b += 1 }
      AudioSpectral(a.media_id, a.sampleRate, nFrames, dom, energy)
    })
  }

  /** Quantized Goertzel coefficients for [[audioSpectralQuantized]]:
    * band b targets the same DFT bin as [[audioSpectral]]; the float
    * coefficient 2·cos(2πk/frameSize) is rounded once to a q-scaled
    * long HERE, and the oracle SQL interpolates these exact constants
    * as literals — so neither engine's trig library is in the loop. */
  def goertzelCoeffsQ(frameSize: Int, bands: Int, q: Long): Array[Long] =
    Array.tabulate(bands) { b =>
      val k = math.max(1,
        math.round((b + 0.5) * frameSize / (2.0 * bands)).toInt)
      math.round(2.0 * math.cos(2.0 * math.Pi * k / frameSize) * q)
    }

  /** Fixed-point integer twin of [[audioSpectral]] — the cross-engine
    * witness for the Goertzel float recurrence (the simhash/countmin
    * md5-twin convention: the float gate stays the production path;
    * this twin proves the recurrence STRUCTURE exactly). Every op is
    * exact i64 arithmetic with truncating division — Java long `/`
    * and DuckDB `//` both truncate toward zero — so the fold is
    * bit-replayable from the dumped PCM artifact:
    * s0 = x + (cq·s1)/q − s2, per-frame energy
    * s1² + s2² − ((cq·s1)/q)·s2, summed over whole frames. State is
    * bounded by ~frameSize·32768 (oscillatory recurrence, |coeff|<2),
    * so with q = 2^20 every intermediate stays ≪ 2^63. Media with no
    * whole frame emit nothing (mirrors the oracle's empty group). */
  def audioSpectralQuantized(audio: Dataset[DecodedAudio],
      frameSize: Int = 512, bands: Int = 8,
      q: Long = 1L << 20): Dataset[AudioSpectralQ] = {
    require(frameSize > 0 && bands > 0 && bands * 2 <= frameSize)
    val cqs = goertzelCoeffsQ(frameSize, bands, q)
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.flatMap { a =>
      val nFrames = a.samples.length / frameSize
      if (nFrames == 0) Iterator.empty else {
        val energy = new Array[Long](bands)
        var f = 0
        while (f < nFrames) {
          var b = 0
          while (b < bands) {
            val cq = cqs(b)
            var s1 = 0L; var s2 = 0L
            var i = f * frameSize
            val end = i + frameSize
            while (i < end) {
              val s0 = a.samples(i).toLong + (cq * s1) / q - s2
              s2 = s1; s1 = s0; i += 1
            }
            energy(b) += s1 * s1 + s2 * s2 - ((cq * s1) / q) * s2
            b += 1
          }
          f += 1
        }
        (0 until bands).iterator
          .map(b => AudioSpectralQ(a.media_id, b, nFrames, energy(b)))
      }
    })
  }

  /** Frame sampling for video payloads: every Nth frame, where the stub
    * video is a stack of stub images of equal size. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .mapPartitions(_.flatMap { row =>
        StubCodec.decode(row.payload) match {
          case Some((w, h, c, px)) =>
            // stub video: height = frameH * numFrames, square frames
            val frameH = w
            val numFrames = h / math.max(frameH, 1)
            val frameBytes = w * frameH * c
            (0 until numFrames by everyN).iterator.map { f =>
              VideoFrame(row.media_id, f,
                java.util.Arrays.copyOfRange(px, f * frameBytes, (f + 1) * frameBytes))
            }
          case None => Iterator.empty
        }
      })
  }

  /** Keyframe / scene-change detection: per video, the mean absolute
    * pixel difference (MAD) of each frame against its predecessor;
    * emit frame 0 plus every frame with MAD > `threshold`. One decode
    * per video, two frames of state at a time — the standard cheap
    * shot-boundary detector, and the pre-filter that decides which
    * frames are worth the expensive downstream encoder at 100 TB of
    * video (sample everything, embed only scene changes). */
  def keyframes(media: Dataset[MediaRow], threshold: Double): Dataset[Keyframe] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .mapPartitions(_.flatMap { row =>
        StubCodec.decode(row.payload) match {
          case Some((w, h, c, px)) =>
            val frameH = w
            val numFrames = h / math.max(frameH, 1)
            val frameBytes = w * frameH * c
            (0 until numFrames).iterator.flatMap { f =>
              if (f == 0) Iterator.single(Keyframe(row.media_id, 0, 0.0))
              else {
                val off = f * frameBytes
                val prev = off - frameBytes
                var s = 0L
                var i = 0
                while (i < frameBytes) {
                  s += math.abs((px(off + i) & 0xff) - (px(prev + i) & 0xff))
                  i += 1
                }
                val mad = s.toDouble / frameBytes
                if (mad > threshold) Iterator.single(Keyframe(row.media_id, f, mad))
                else Iterator.empty
              }
            }
          case None => Iterator.empty
        }
      })
  }

  /** Integer-exact keyframe variant for the cross-engine gate: the
    * same decode + frame-MAD loop as [[keyframes]], but the emitted
    * score is micro-unit floor-divided (mad_e6 = Σ|Δpx|·10⁶ / nPx,
    * exact long arithmetic) and the threshold compare is the integer
    * equivalent Σ|Δpx| > threshold·nPx — identical accept set to the
    * float kernel for integer thresholds (both sides exact), and a
    * value DuckDB reproduces bit-for-bit with `//`. */
  def keyframesMicro(media: Dataset[MediaRow], threshold: Long):
      Dataset[(Long, Int, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .mapPartitions(_.flatMap { row =>
        StubCodec.decode(row.payload) match {
          case Some((w, h, c, px)) =>
            val frameH = w
            val numFrames = h / math.max(frameH, 1)
            val frameBytes = w * frameH * c
            (0 until numFrames).iterator.flatMap { f =>
              if (f == 0) Iterator.single((row.media_id, 0, 0L))
              else {
                val off = f * frameBytes
                var s = 0L
                var i = 0
                while (i < frameBytes) {
                  s += math.abs((px(off + i) & 0xff) -
                    (px(off - frameBytes + i) & 0xff))
                  i += 1
                }
                if (s > threshold * frameBytes)
                  Iterator.single((row.media_id, f, s * 1000000L / frameBytes))
                else Iterator.empty
              }
            }
          case None => Iterator.empty
        }
      }).toDF("media_id", "frame_index", "mad_e6")
      .as[(Long, Int, Long)]
  }

  /** Integer-exact audio stats for the cross-engine gate: peak,
    * zero-crossings, Σs² (exact long — ≤ 2³¹·n stays far under 2⁶³),
    * and micro-second duration by floor division. RMS = √(Σs²/n) is a
    * monotone presentation of sq_sum and stays on [[audioFeatures]]. */
  def audioStats(audio: Dataset[DecodedAudio]):
      Dataset[(Long, Int, Long, Long, Int, Long, Long)] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.map { a =>
      val n = a.samples.length
      var sq = 0L; var peak = 0; var zc = 0L
      var i = 0
      while (i < n) {
        val v = a.samples(i).toInt
        sq += v.toLong * v
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((a.samples(i - 1) < 0) != (v < 0))) zc += 1
        i += 1
      }
      (a.media_id, a.sampleRate, n.toLong,
        if (a.sampleRate > 0) n.toLong * 1000000L / a.sampleRate else 0L,
        peak, zc, sq)
    }).toDF("media_id", "sample_rate", "n_samples", "dur_us",
      "peak", "zero_crossings", "sq_sum")
      .as[(Long, Int, Long, Long, Int, Long, Long)]
  }

  /** Fixture generator: a deterministic media table mixing REAL
    * containers (PNG via ImageIO, WAV via javax.sound — decoded by the
    * real JDK codecs in the gate) with stub-format rows (the seam for
    * codecs the JDK lacks). Used by tests; doubles as the schema
    * reference. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val i = id.toInt
      if (i % 3 != 2) {
        val w = 16 + (i % 4) * 8; val h = 16 + (i % 3) * 8
        if (i % 2 == 0) {
          MediaRow(i.toLong, "image", JdkCodec.encodePng(w, h),
            MediaMeta(w, h, 3, 0, 0, "png"))
        } else {
          MediaRow(i.toLong, "image", StubCodec.encode(w, h, 3),
            MediaMeta(w, h, 3, 0, 0, "stub-img"))
        }
      } else if (i % 6 == 5) {
        val rate = 16000; val samples = 256 + i
        if (i % 12 == 5) {
          MediaRow(i.toLong, "audio", JdkCodec.encodeWav(rate, samples),
            MediaMeta(0, 0, 1, rate, samples * 1000 / rate, "wav"))
        } else {
          MediaRow(i.toLong, "audio", StubCodec.encodeAudio(rate, samples),
            MediaMeta(0, 0, 1, rate, samples * 1000 / rate, "stub-pcm"))
        }
      } else {
        val w = 8; val frames = 4 + i % 3
        MediaRow(i.toLong, "video", StubCodec.encode(w, w * frames, 3),
          MediaMeta(w, w, 3, 0, frames * 40, "stub-vid"))
      }
    }
  }
}
