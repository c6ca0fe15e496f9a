package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("stub codec roundtrip + malformed payload rejection") {
    val enc = StubCodec.encode(4, 3, 2)
    val Some((w, h, c, px)) = StubCodec.decode(enc)
    assert((w, h, c) === (4, 3, 2))
    assert(px.length === 24)
    assert(StubCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(StubCodec.decode(enc.take(12)).isEmpty) // truncated pixels
    assert(StubCodec.decode(null).isEmpty)
  }

  test("JDK codecs decode real PNG and WAV containers, pixel/sample-exact") {
    // PNG is lossless and both encoders use the same deterministic
    // pattern, so the REAL container roundtrip must equal the stub's
    // raw content exactly
    val Some((pw, ph, pc, png)) = JdkCodec.decodeImage(JdkCodec.encodePng(16, 24))
    val Some((_, _, _, stub)) = StubCodec.decode(StubCodec.encode(16, 24, 3))
    assert((pw, ph, pc) === (16, 24, 3))
    assert(png === stub)
    val Some((rate, wav)) = JdkCodec.decodeWav(JdkCodec.encodeWav(16000, 300))
    val Some((_, stubPcm)) = StubCodec.decodeAudio(StubCodec.encodeAudio(16000, 300))
    assert(rate === 16000)
    assert(wav === stubPcm)
    // corrupt containers are rejected, not thrown
    assert(JdkCodec.decodeImage("not a png".getBytes).isEmpty)
    assert(JdkCodec.decodeWav("RIFFxxxxWAVEbroken".getBytes).isEmpty)
    // magic dispatch: a PNG payload in the pipeline decodes via ImageIO
    assert(JdkCodec.isPng(JdkCodec.encodePng(8, 8)))
    assert(JdkCodec.isWav(JdkCodec.encodeWav(8000, 10)))
    assert(!JdkCodec.isPng(StubCodec.encode(8, 8, 3)))
  }

  test("JPEG and BMP payloads dispatch to the JDK codec, not the stub") {
    import spark.implicits._
    // re-encode the deterministic pattern as real JPEG/BMP containers
    def reencode(fmt: String): Array[Byte] = {
      val Some((w, h, _, px)) = StubCodec.decode(StubCodec.encode(10, 6, 3))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y, ((px(i) & 0xff) << 16) | ((px(i + 1) & 0xff) << 8) |
          (px(i + 2) & 0xff))
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out))
      out.toByteArray
    }
    val jpeg = reencode("jpg")
    val bmp = reencode("bmp")
    assert(JdkCodec.isJpeg(jpeg) && !JdkCodec.isPng(jpeg) && !JdkCodec.isBmp(jpeg))
    assert(JdkCodec.isBmp(bmp) && !JdkCodec.isJpeg(bmp))
    // before the magic fix these fell through to the stub and were
    // dropped as "corrupt"; now they decode through the pipeline
    val rows = Seq(
      MediaRow(1L, "image", jpeg, MediaMeta(10, 6, 3, 0, 0, "jpeg")),
      MediaRow(2L, "image", bmp, MediaMeta(10, 6, 3, 0, 0, "bmp"))).toDS()
    val decoded = decodeImages(rows).collect().sortBy(_.media_id)
    assert(decoded.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(decoded.forall(d => d.width === 10 && d.height === 6 && d.channels === 3))
    // BMP is lossless → bit-exact vs the stub pattern; JPEG is lossy →
    // decoded, with the right shape, is the contract
    val Some((_, _, _, stubPx)) = StubCodec.decode(StubCodec.encode(10, 6, 3))
    assert(decoded.find(_.media_id == 2L).get.pixels === stubPx)
  }

  test("decode drops corrupt rows instead of failing the job") {
    import spark.implicits._
    val good = syntheticMedia(spark, 9)
    val corrupt = Seq(MediaRow(99L, "image", Array[Byte](0, 1, 2),
      MediaMeta(0, 0, 0, 0, 0, "broken"))).toDS()
    val decoded = decodeImages(good.unionByName(corrupt))
    val ids = decoded.collect().map(_.media_id).toSet
    assert(!ids.contains(99L))
    assert(ids.nonEmpty)
  }

  test("decode → resize → features pipeline shapes") {
    val media = syntheticMedia(spark, 9)
    val images = decodeImages(media)
    val n = images.count()
    assert(n === media.filter(col("kind") === "image").count())
    val small = resize(images, 8, 8)
    small.collect().foreach { img =>
      assert(img.width === 8 && img.height === 8)
      assert(img.pixels.length === 8 * 8 * img.channels)
    }
    val feats = imageFeatures(small)
    feats.collect().foreach { f =>
      assert(f.mean.length === 3 && f.std.length === 3)
      f.mean.foreach(m => assert(m >= 0f && m <= 255f))
      f.std.foreach(s => assert(s >= 0f))
    }
    // deterministic: same pipeline twice → identical features
    val a = feats.collect().map(f => (f.media_id, f.mean.toSeq)).toMap
    val b = imageFeatures(resize(decodeImages(media), 8, 8))
      .collect().map(f => (f.media_id, f.mean.toSeq)).toMap
    assert(a === b)
  }

  test("video frame sampling: every Nth frame, correct frame bytes") {
    val media = syntheticMedia(spark, 9)
    val all = sampleFrames(media, everyN = 1).collect()
    val sampled = sampleFrames(media, everyN = 2).collect()
    assert(all.nonEmpty)
    assert(sampled.length < all.length)
    sampled.foreach { f =>
      assert(f.frameIndex % 2 === 0)
      assert(f.pixels.length === 8 * 8 * 3)
    }
  }

  test("audio decode + waveform features over stub PCM") {
    // codec roundtrip
    val enc = StubCodec.encodeAudio(16000, 100)
    val Some((rate, samples)) = StubCodec.decodeAudio(enc)
    assert(rate === 16000 && samples.length === 100)
    assert(StubCodec.decodeAudio(Array[Byte]('G', 'A', 0)).isEmpty)
    assert(StubCodec.decodeAudio(enc.take(50)).isEmpty) // truncated
    // pipeline over the synthetic table (ids with i % 6 == 5)
    val media = syntheticMedia(spark, 12)
    val feats = audioFeatures(decodeAudio(media)).collect()
    assert(feats.map(_.media_id).toSet === Set(5L, 11L))
    feats.foreach { f =>
      assert(f.sampleRate === 16000)
      assert(f.nSamples === 256 + f.media_id.toInt)
      assert(f.rms > 0.0 && f.peak > 0 && f.zeroCrossings > 0)
      assert(math.abs(f.durationMs - f.nSamples * 1000.0 / 16000) < 1e-9)
    }
  }

  test("media schema matches the declared StructType after a parquet roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    syntheticMedia(spark, 6).toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema.fieldNames.toSeq === mediaSchema.fieldNames.toSeq)
    assert(back.schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    assert(back.count() === 6L)
  }

  test("keyframes: frame 0 always emitted, MAD exact vs hand computation") {
    import graft.multimodal.Multimodal._
    import spark.implicits._
    val media = syntheticMedia(spark, 30)
    val kf = keyframes(media, threshold = 64.0).collect()
      .groupBy(_.media_id)
    val vids = media.filter(_.kind == "video").collect()
    assert(vids.nonEmpty && kf.nonEmpty)
    vids.foreach { v =>
      val frames = kf.get(v.media_id).map(_.sortBy(_.frameIndex)).getOrElse(Array.empty)
      assert(frames.headOption.exists(k => k.frameIndex == 0 && k.mad == 0.0),
        s"video ${v.media_id} missing frame 0")
      // hand-recompute MAD for the first detected scene change
      val Some((w, h, c, px)) = StubCodec.decode(v.payload): @unchecked
      val fb = w * w * c
      frames.drop(1).headOption.foreach { k =>
        val off = k.frameIndex * fb
        var sum = 0L
        var i = 0
        while (i < fb) {
          sum += math.abs((px(off + i) & 0xff) - (px(off - fb + i) & 0xff)); i += 1
        }
        assert(k.mad === sum.toDouble / fb)
        assert(k.mad > 64.0)
      }
    }
    // the threshold actually filters: above the noise ceiling (~115 on
    // the stub fixture) every video collapses to just its frame 0
    val strict = keyframes(media, threshold = 115.0).collect()
    assert(strict.nonEmpty)
    assert(strict.forall(k => k.frameIndex == 0 && k.mad == 0.0))
  }
}
