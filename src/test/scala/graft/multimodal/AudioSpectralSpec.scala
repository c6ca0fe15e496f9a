package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import Multimodal._

class AudioSpectralSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  /** Pure-sine PCM16 at DFT bin `k` of a `frameSize` frame. */
  private def sine(k: Int, frameSize: Int, frames: Int): Array[Short] =
    Array.tabulate(frameSize * frames)(i =>
      (math.sin(2.0 * math.Pi * k * i / frameSize) * 12000).toShort)

  private def run(samples: Array[Short], bands: Int = 8) = {
    import spark.implicits._
    val ds = Seq(DecodedAudio(1L, 16000, samples)).toDS()
    audioSpectral(ds, frameSize = 512, bands = bands).collect()(0)
  }

  test("a pure sine lands its energy in the containing band") {
    // band b covers bins near (b + 0.5) * 512 / 16 = 32b + 16
    for (b <- Seq(0, 3, 7)) {
      val got = run(sine(32 * b + 16, 512, frames = 4))
      assert(got.dominantBand === b, s"band $b")
      // dominant band carries at least 10x any other band's energy
      val dom = got.bandEnergy(b)
      got.bandEnergy.zipWithIndex.foreach { case (e, i) =>
        if (i != b) assert(e * 10 <= dom, s"leak into band $i for tone $b")
      }
    }
  }

  test("silence has zero energy everywhere; dominant defaults to band 0") {
    val got = run(new Array[Short](1024))
    assert(got.dominantBand === 0)
    assert(got.bandEnergy.forall(_ === 0.0))
    assert(got.nFrames === 2)
  }

  test("ragged tail shorter than a frame is dropped") {
    val got = run(sine(16, 512, 1) ++ new Array[Short](100))
    assert(got.nFrames === 1)
  }

  test("end-to-end over the synthetic media table decodes and ranks") {
    import spark.implicits._
    val wav = JdkCodec.encodeWav(16000, 2048)
    val media = Seq(MediaRow(10L, "audio", wav,
      MediaMeta(0, 0, 1, 16000, 128, "wav"))).toDS()
    val got = audioSpectral(decodeAudio(media)).collect()
    assert(got.length === 1)
    assert(got(0).nFrames === 4)
    assert(got(0).bandEnergy.forall(_ >= 0.0))
  }
}
