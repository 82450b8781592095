package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The REAL JDK image codec ([[Multimodal.JdkImageCodec]] /
  * [[Multimodal.resizeImages]]): deterministic synthetic images are
  * encoded with `javax.imageio` (PNG and BMP — two different container
  * formats), pushed through the distributed decode/resize operators,
  * and checked against locally computed dimensions and PIXEL-content
  * fingerprints. This replaces "environment-blocked" for the decode
  * step: the JDK's own registry needs no external image libraries.
  */
class MultimodalJdkSpec extends SparkTestBase {
  import spark.implicits._

  private def makeImage(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 101) & 0xffffff)
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, buf), s"JDK cannot encode $fmt")
    buf.toByteArray
  }

  private def pixelFingerprint(img: java.awt.image.BufferedImage): Long = {
    var fp = 1125899906842597L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      fp = 31 * fp + img.getRGB(x, y)
    fp
  }

  test("JdkImageCodec decodes real PNG and BMP bytes to exact dims + pixel fingerprints") {
    val imgs = Seq(
      (1L, makeImage(23, 11, 1), "png"),
      (2L, makeImage(7, 40, 2), "png"),
      (3L, makeImage(16, 16, 3), "bmp"))
    val rows = imgs.map { case (id, img, fmt) => (id, encode(img, fmt), s"image/$fmt") }
    val media = rows.toDF("media_id", "media", "mime")
      .withColumn("byte_len", length($"media").cast("long"))
    val got = Multimodal.decodeImages(media).collect()
      .map(m => m.media_id -> m).toMap
    imgs.foreach { case (id, img, _) =>
      val m = got(id)
      assert((m.width, m.height, m.n_frames) == ((img.getWidth, img.getHeight, 1)))
      // content hash: recompute from the ORIGINAL raster — PNG and BMP
      // are lossless, so pixel fingerprints must match exactly
      assert(m.fingerprint == pixelFingerprint(img), s"media $id pixel hash")
    }
    // undecodable bytes fail loudly with the media id
    val bad = Seq((9L, "not an image".getBytes("UTF-8"), "image/png"))
      .toDF("media_id", "media", "mime")
    val ex = intercept[Exception] { Multimodal.decodeImages(bad).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("not a JDK-decodable image")))
  }

  test("decodeWav parses real WAV bytes: format envelope + PCM fingerprint") {
    import javax.sound.sampled._
    def makeWav(id: Long, rate: Int, channels: Int, samples: Int): (Long, Array[Byte], Array[Byte]) = {
      // deterministic 16-bit PCM
      val pcm = Array.tabulate(samples * channels * 2)(i => ((i * 13 + id * 7) & 0xff).toByte)
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
      (id, buf.toByteArray, pcm)
    }
    val wavs = Seq(makeWav(1L, 16000, 1, 480), makeWav(2L, 44100, 2, 100))
    val media = wavs.map { case (id, bytes, _) => (id, bytes) }.toDF("media_id", "media")
    val got = Multimodal.decodeWav(media).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).sample_rate == 16000 && got(1L).channels == 1 && got(1L).n_samples == 480L)
    assert(got(2L).sample_rate == 44100 && got(2L).channels == 2 && got(2L).n_samples == 100L)
    // PCM content hash matches a local fold over the raw samples
    wavs.foreach { case (id, _, pcm) =>
      var h = 1125899906842597L
      pcm.foreach(b => h = 31 * h + b)
      assert(got(id).fingerprint == h, s"media $id pcm hash")
    }
    // undecodable bytes fail loudly
    val ex = intercept[Exception] {
      Multimodal.decodeWav(Seq((9L, "nope".getBytes("UTF-8"))).toDF("media_id", "media")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("not a JDK-decodable audio")))
  }

  test("resizeImages downscales aspect-preserving, never upscales, output re-decodes") {
    val media = Seq(
      (1L, encode(makeImage(64, 32, 4), "png")),   // downscale 2:1 aspect
      (2L, encode(makeImage(10, 10, 5), "png")))   // already small: untouched dims
      .toDF("media_id", "media")
    val resized = Multimodal.resizeImages(media, maxSide = 16)
    // envelope shape matches asMedia's contract
    assert(resized.columns.toSeq == Seq("media_id", "media", "mime", "byte_len"))
    val back = Multimodal.decodeImages(resized).collect()
      .map(m => m.media_id -> ((m.width, m.height))).toMap
    assert(back(1L) == ((16, 8)), s"aspect not preserved: ${back(1L)}")
    assert(back(2L) == ((10, 10)), s"small image must not upscale: ${back(2L)}")
    // resized bytes really are PNG (magic header)
    val bytes = resized.filter($"media_id" === 1L).select($"media")
      .collect().head.getAs[Array[Byte]](0)
    assert(bytes.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
  }

  test("averageHash64: re-encode invariant, near for noisy copies, far for distinct; pairs find the copies") {
    // base images + a one-pixel-perturbed copy of each (perceptually
    // identical) + genuinely different images
    def perturb(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
      val c = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        c.setRGB(x, y, img.getRGB(x, y))
      c.setRGB(0, 0, img.getRGB(0, 0) ^ 0x010101)
      c
    }
    val base1 = makeImage(40, 40, 7)
    val base2 = makeImage(40, 40, 1000) // different seed → different gradient phase
    val media = Seq(
      (1L, encode(base1, "png")),
      (2L, encode(base1, "bmp")), // same pixels, different container
      (3L, encode(perturb(base1), "png")),
      (4L, encode(base2, "png")))
      .toDF("media_id", "media")
    val hashes = Multimodal.averageHash64(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lossless re-encode: identical pixels → identical hash
    assert(hashes(1L) == hashes(2L), "container change must not move the hash")
    // local against the pure kernel
    assert(hashes(1L) == Multimodal.AHash.ahash64(base1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(3L)) <= 2, "one-pixel noise must stay near")
    // the gradients differ in phase: most block means flip relative
    // to the global mean
    assert(ham(hashes(1L), hashes(4L)) > 6,
      s"distinct images expected far apart, got ${ham(hashes(1L), hashes(4L))}")
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // tiny images exercise the empty-block path without throwing
    val tiny = Seq((9L, encode(makeImage(3, 5, 1), "png"))).toDF("media_id", "media")
    assert(Multimodal.averageHash64(tiny).count() == 1L)
    // oversize guard
    val big = new java.awt.image.BufferedImage(
      1 << 13, 1 << 13, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val e = intercept[IllegalArgumentException](Multimodal.AHash.ahash64(big))
    assert(e.getMessage.contains("downscale"))
  }
}
