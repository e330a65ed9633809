package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The real decode path: binary PPM payloads decode to pixels inside
  * the distributed featurizer; unsupported formats fail addressed (or
  * fall back to hash features in the total pipeline). */
class MultimodalDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Build a P6 PPM: w x h, all pixels (r,g,b). */
  private def ppm(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val body = Array.fill(w * h)(Array(r.toByte, g.toByte, b.toByte)).flatten
    header ++ body
  }

  test("PPM decodes to the expected grayscale matrix") {
    val img = Multimodal.decodeImage(ppm(4, 2, 255, 255, 255))
    assert(img.length == 2 && img.head.length == 4)
    assert(img.flatten.forall(v => math.abs(v - 1.0f) < 1e-3))
    val dark = Multimodal.decodeImage(ppm(3, 3, 0, 0, 0))
    assert(dark.flatten.forall(_ == 0.0f))
    // luma weighting: pure red is darker than pure green
    val red = Multimodal.decodeImage(ppm(1, 1, 255, 0, 0)).head.head
    val green = Multimodal.decodeImage(ppm(1, 1, 0, 255, 0)).head.head
    assert(red < green && math.abs(red - 0.299f) < 1e-3)
  }

  test("comments and odd whitespace in the header parse") {
    val bytes = "P6\n# a comment\n 2 1 # trailing\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val img = Multimodal.decodeImage(bytes)
    assert(img.length == 1 && img.head.length == 2)
  }

  test("unsupported formats fail with an addressed error") {
    // unknown magic: no ImageIO reader claims it
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeImage("XXunknown-payload".getBytes("US-ASCII")))
    assert(e.getMessage.contains("unsupported image format"))
    // a TRUNCATED known format (PNG magic, no body) also fails
    // addressed rather than NPEing inside the codec
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodeImage(Array[Byte](0x89.toByte, 'P', 'N', 'G')))
    assert(e2.getMessage.contains("unsupported image format"))
    // corrupt body behind a valid JPEG magic: the codec throws
    // internally; the operator still fails ADDRESSED (and the
    // featurize pipeline's fallback therefore still catches it)
    val corrupt = encoded("jpg", 4, 4, 10, 20, 30).take(24)
    val e3 = intercept[IllegalArgumentException](
      Multimodal.decodeImage(corrupt))
    assert(e3.getMessage.contains("unsupported image format"))
  }

  /** Encode a solid-color image via the JDK codec under test. */
  private def encoded(fmt: String, w: Int, h: Int,
                      r: Int, g: Int, b: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, (r << 16) | (g << 8) | b)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, bos)
    bos.toByteArray
  }

  test("PNG decodes losslessly to the PPM luma convention") {
    val img = Multimodal.decodeImage(encoded("png", 5, 3, 200, 100, 50))
    assert(img.length == 3 && img.head.length == 5)
    val want = (0.299f * 200 + 0.587f * 100 + 0.114f * 50) / 255.0f
    assert(img.flatten.forall(v => math.abs(v - want) < 1e-6))
    // same pixels as the equivalent PPM, bit-for-bit
    val viaPpm = Multimodal.decodeImage(ppm(5, 3, 200, 100, 50))
    assert(img.flatten.toSeq == viaPpm.flatten.toSeq)
  }

  test("JPEG decodes (lossy: uniform images land within codec tolerance)") {
    val img = Multimodal.decodeImage(encoded("jpg", 8, 8, 128, 128, 128))
    assert(img.length == 8 && img.head.length == 8)
    val want = 128f / 255f
    assert(img.flatten.forall(v => math.abs(v - want) < 4f / 255f),
      s"jpeg gray drifted: ${img.flatten.take(4).toSeq}")
  }

  test("resize downsamples deterministically") {
    val img = Array.tabulate(8, 8)((y, _) => y.toFloat)
    val small = Multimodal.resize(img, 2, 4)
    assert(small.length == 2 && small.head.length == 4)
    assert(small(0).forall(_ == 0f) && small(1).forall(_ == 4f))
  }

  /** Build a PCM16 RIFF/WAVE payload from float samples in [-1,1]. */
  private def wav(samples: Seq[Float], channels: Int = 1): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { data.write(v & 0xFF); data.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    val dataLen = samples.length * channels * 2
    data.write("RIFF".getBytes); w32(36 + dataLen); data.write("WAVE".getBytes)
    data.write("fmt ".getBytes); w32(16)
    w16(1); w16(channels); w32(8000); w32(8000 * channels * 2); w16(channels * 2); w16(16)
    data.write("data".getBytes); w32(dataLen)
    samples.foreach { s =>
      val v = math.max(-32768, math.min(32767, (s * 32768).toInt))
      (1 to channels).foreach(_ => w16(v))
    }
    data.toByteArray
  }

  test("WAV PCM16 decodes; features capture energy and zero crossings") {
    // a square wave alternating +0.5/-0.5
    val square = (0 until 800).map(i => if ((i / 10) % 2 == 0) 0.5f else -0.5f)
    val samples = Multimodal.decodeWav(wav(square))
    assert(samples.length == 800)
    assert(math.abs(samples.head - 0.5f) < 1e-3)
    val feats = Multimodal.audioFeatures(samples, 4)
    assert(feats.length == 8)
    // RMS of a +/-0.5 square is 0.5; ZCR of the 10-sample period is ~0.1
    assert(math.abs(feats(0) - 0.5f) < 1e-2)
    assert(feats(1) > 0.05f && feats(1) < 0.15f)
    // stereo payload mono-izes to the same values
    val stereo = Multimodal.decodeWav(wav(square, channels = 2))
    assert(stereo.length == 800 && math.abs(stereo.head - 0.5f) < 1e-3)
    // compressed encodings are refused with an addressed error
    val bad = wav(square).clone()
    bad(20) = 2 // format tag: ADPCM
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
    assert(e.getMessage.contains("unsupported WAV encoding"))
  }

  test("frame sampling decodes every Nth PPM frame of a concatenated stream") {
    // 6 frames with increasing brightness
    val stream = (0 until 6).flatMap(i => ppm(2, 2, i * 40, i * 40, i * 40)).toArray
    val all = Multimodal.frameSample(stream, 1)
    assert(all.length == 6)
    val sampled = Multimodal.frameSample(stream, 3)
    assert(sampled.length == 2) // frames 0 and 3
    assert(math.abs(sampled(1).head.head - all(3).head.head) < 1e-6)
    assert(sampled.head.head.head == 0f)
  }

  test("featurizePartitioned runs the REAL decode over MIXED formats") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "cam", ppm(8, 8, 255, 255, 255)),       // white PPM
      Multimodal.Asset(2L, "cam", ppm(8, 8, 0, 0, 0)),             // black PPM
      Multimodal.Asset(3L, "txt", "not an image".getBytes),        // fallback
      Multimodal.Asset(4L, "web", encoded("png", 8, 8, 255, 255, 255)), // white PNG
      Multimodal.Asset(5L, "web", encoded("jpg", 8, 8, 0, 0, 0)))  // black JPEG
      .toDS()
    val out = Multimodal.featurizePartitioned(assets).collect()
      .map(f => f.doc_id -> f).toMap
    // real pixels: white -> all ~1, black -> all 0 — regardless of
    // which codec produced them
    assert(out(1L).features.forall(v => math.abs(v - 1.0f) < 1e-3))
    assert(out(2L).features.forall(_ == 0.0f))
    assert(out(4L).features.forall(v => math.abs(v - 1.0f) < 1e-3))
    assert(out(5L).features.forall(v => v < 4f / 255f))
    assert(out(1L).features.length == 8)
    // non-image payload flows through the hash fallback, stays bounded
    assert(out(3L).features.forall(v => v >= 0f && v < 1f))
    assert(out(3L).byte_len == "not an image".length)
  }
}
