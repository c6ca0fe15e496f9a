package graft.multimodal

import graft.multimodal.Multimodal._
import org.scalatest.funsuite.AnyFunSuite

class PhashSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  private def imgDs(rows: Seq[MediaRow]) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  test("same pixels under PNG and BMP containers hash identically") {
    import spark.implicits._
    // JdkCodec.encodePng pixel function is deterministic in pixel index;
    // decode → re-encode the same WxH twice gives identical pixel grids
    val a = MediaRow(1L, "image", JdkCodec.encodePng(32, 24), MediaMeta(32, 24, 3, 0, 0, "png"))
    val b = MediaRow(2L, "image", JdkCodec.encodePng(32, 24), MediaMeta(32, 24, 3, 0, 0, "png"))
    val c = MediaRow(3L, "image", JdkCodec.encodePng(48, 24), MediaMeta(48, 24, 3, 0, 0, "png"))
    val hashes = dHash(decodeImages(imgDs(Seq(a, b, c)))).collect().toMap
    assert(hashes(1L) === hashes(2L))
    assert(hashes(1L) !== hashes(3L)) // different content → different code
  }

  test("2x nearest-neighbor upscale stays within small hamming distance") {
    import spark.implicits._
    // a spatially-correlated image (gradient), the content class dHash
    // is designed for — box averages preserve local ordering across
    // resolutions. (The synthetic PNG is pseudo-random noise, where
    // adjacent-cell means tie and resampling legitimately flips bits.)
    def gradient(id: Long, w: Int, h: Int): DecodedImage = {
      val px = Array.tabulate(w * h * 3) { i =>
        val p = i / 3; val x = p % w; val y = p / w
        (math.min(255, x * 5 + y * 3) & 0xff).toByte
      }
      DecodedImage(id, w, h, 3, px)
    }
    val decoded = spark.createDataset(Seq(gradient(1L, 32, 24)))
    val up = resize(decoded, 64, 48)
    val h0 = dHash(decoded).collect().head._2
    val h1 = dHash(up).collect().head._2
    val dist = java.lang.Long.bitCount(h0 ^ h1)
    assert(dist <= 2, s"upscale moved the perceptual hash by $dist bits")
  }

  test("blocked pair join equals brute-force hamming pairs on the fixture") {
    val media = syntheticMedia(spark, 120)
    val hashes = dHash(decodeImages(media)).collect().toMap
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <= 4
    } yield (i, j)).toSet
    val blocked = imageNearDuplicates(media, maxDist = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain repeated image content")
    assert(blocked === brute)
  }
}
