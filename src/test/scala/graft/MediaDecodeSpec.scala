package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.MediaOps
import org.apache.spark.sql.functions._

/** Feeds the REAL decode paths real payloads: a PNG generated
  * in-test must come back with true pixel dimensions and a
  * normalized luminance histogram; a WAV generated in-test must come
  * back with its true sample rate / channels / frame count; garbage
  * bytes must fall through to the deterministic stub.
  */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(sampleRate: Float, nFrames: Int): Array[Byte] = {
    // 8-bit mono PCM ramp — every amplitude octile populated
    val pcm = Array.tabulate(nFrames)(i => (i * 7 % 256).toByte)
    val fmt = new AudioFormat(sampleRate, 8, 1, false, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("a real PNG decodes to true dimensions and a normalized luminance histogram") {
    // left half black (lum 0 → bin 0), right half white (lum 255 → bin 7)
    val bytes = pngBytes(20, 10)((x, _) => if (x < 10) 0x000000 else 0xFFFFFF)
    val media = Seq((1L, "image", bytes)).toDF("doc_id", "media_type", "media")
    val r = MediaOps.decode(media).head()
    assert(r.width == 20 && r.height == 10 && r.n_frames == 1)
    assert(r.n_bytes == bytes.length)
    assert(r.features.length == 8)
    assert(math.abs(r.features.sum - 1.0f) < 1e-5f, s"histogram ${r.features.toSeq}")
    // the two populated bins are the extremes, in equal measure
    assert(math.abs(r.features(0) - 0.5f) < 1e-5f)
    assert(math.abs(r.features(7) - 0.5f) < 1e-5f)
    assert(r.features.slice(1, 7).forall(_ == 0.0f))
  }

  test("a real WAV decodes to true sample rate / channels / frame count") {
    val bytes = wavBytes(8000f, 2048)
    val media = Seq((2L, "audio", bytes)).toDF("doc_id", "media_type", "media")
    val r = MediaOps.decode(media).head()
    assert(r.width == 8000, s"sample rate ${r.width}")     // Hz in the width slot
    assert(r.height == 1, s"channels ${r.height}")          // mono
    assert(r.n_frames == 2048, s"frames ${r.n_frames}")
    assert(math.abs(r.features.sum - 1.0f) < 1e-5f)
    // the ramp covers all octiles — no empty amplitude bin
    assert(r.features.forall(_ > 0.0f), r.features.toSeq.toString)
  }

  test("garbage payloads fall through to the deterministic stub") {
    val junk = Array.tabulate(100)(i => (i * 31 % 251).toByte)
    val media = Seq((3L, "video", junk)).toDF("doc_id", "media_type", "media")
    val r = MediaOps.decode(media).head()
    // stub contract: dims derived from payload length alone
    assert(r.width == 16 + junk.length % 640)
    assert(r.height == 16 + junk.length % 480)
    assert(r.n_frames == 1 + junk.length % 24) // video stub frame-samples
    assert(r.features.length == 8)
  }

  test("mixed batch: each row routes to its own decoder independently") {
    val rows = Seq(
      (10L, "image", pngBytes(8, 8)((_, _) => 0x808080)),
      (11L, "audio", wavBytes(44100f, 100)),
      (12L, "image", Array[Byte](1, 2, 3))) // claimed image, not parseable
    val decoded = MediaOps.decode(rows.toDF("doc_id", "media_type", "media"))
      .collect().sortBy(_.doc_id)
    assert(decoded(0).width == 8 && decoded(0).height == 8)
    assert(decoded(1).width == 44100 && decoded(1).n_frames == 100)
    assert(decoded(2).width == 16 + 3 % 640) // stub fallback
  }
}
