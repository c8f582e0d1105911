package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "0123456789" * 60))
      .toDF("id", "payload"),
    "id", "payload", lit("video"))

  it should "carry byte length and checksum metadata" in {
    val m = media.select(col("id"), col("meta.byte_len")).as[(Long, Long)]
      .collect().toMap
    m shouldBe Map(1L -> 8L, 2L -> 2L, 3L -> 600L)
  }

  it should "explode capped deterministic frame samples" in {
    val f = Multimodal.frameSamples(media, "id", frameStride = 100L, maxFrames = 4)
      .select("id", "frame_idx", "byte_offset").as[(Long, Long, Long)].collect()
    // only id=3 has >=100 bytes; 600/100=6 capped at 4 frames
    f.map(_._1).distinct shouldBe Array(3L)
    f.map(t => (t._2, t._3)).sorted shouldBe
      Array((0L, 0L), (1L, 100L), (2L, 200L), (3L, 300L))
  }

  it should "decode per-partition batched features from the payload" in {
    val feats = Multimodal.decodeFeatures(media, "id", dim = 4)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    feats(1L) shouldBe Seq('a'.toDouble, 'b'.toDouble, 'c'.toDouble, 'd'.toDouble)
    feats(2L) shouldBe Seq('x'.toDouble, 'y'.toDouble, 0.0, 0.0) // padded
  }

  it should "decode a real PNG through JDK ImageIO to exact dimensions and means" in {
    // 4×2 solid RGB(10, 200, 30): every channel mean IS the channel value.
    val solid = Multimodal.solidPng(4, 2, 10, 200, 30)
    // 2×1 half-red half-blue: exact fractional means (255/2 per channel).
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x0000ff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val rows = Multimodal.decodeImageFeatures(
      Seq((1L, solid), (2L, out.toByteArray)).toDF("id", "content"), "id")
      .select("id", "width", "height", "channels", "channel_means")
      .as[(Long, Int, Int, Int, Seq[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

    rows(1L) shouldBe ((4, 2, 3, Seq(10.0, 200.0, 30.0)))
    rows(2L) shouldBe ((2, 1, 3, Seq(127.5, 0.0, 127.5)))
  }

  it should "decode grayscale images with a single band" in {
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until 3; y <- 0 until 3) img.getRaster.setSample(x, y, 0, 77)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val r = Multimodal.decodeImageFeatures(
      Seq((9L, out.toByteArray)).toDF("id", "content"), "id")
      .select("width", "height", "channels", "channel_means")
      .as[(Int, Int, Int, Seq[Double])].head()
    r shouldBe ((3, 3, 1, Seq(77.0)))
  }

  it should "decode palette-indexed images to true color values, not palette indices" in {
    // a solid RGB(200, 10, 30) image written as GIF: the decoded raster
    // is palette-INDEXED, and the raw samples are lookup-table positions
    // (likely 0) — the decode must resolve through the palette so the
    // reported channel means are the actual color
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4)
      img.setRGB(x, y, (200 << 16) | (10 << 8) | 30)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    // sanity: the GIF really decodes indexed (else this spec tests nothing)
    javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out.toByteArray))
      .getColorModel shouldBe a[java.awt.image.IndexColorModel]
    val r = Multimodal.decodeImageFeatures(
      Seq((1L, out.toByteArray)).toDF("id", "content"), "id")
      .select("channels", "channel_means").as[(Int, Seq[Double])].head()
    r shouldBe ((3, Seq(200.0, 10.0, 30.0)))
  }

  it should "quarantine undecodable payloads as null rows, not drop them" in {
    val bad = Multimodal.decodeImageFeatures(
      Seq((1L, "not a png".getBytes), (2L, Array.empty[Byte]),
        (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("id", "content"), "id")
    bad.count() shouldBe 3 // no data loss
    bad.filter(col("width").isNull).count() shouldBe 3
  }

  it should "hash images perceptually: scale-invariant dHash with banded near-dup join" in {
    // an image upscaled 2× per axis box-averages back to the identical
    // 9×8 grid, so its dHash must equal the original's — the property
    // that makes dHash a PERCEPTUAL hash rather than a byte hash
    def upscaled(seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 18)
        img.getRaster.setSample(x, y, 0,
          Multimodal.patternValue(seed, x / 2, y / 2).toInt)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val payloads = Seq(
      (1L, Multimodal.grayPatternPng(9, 8, 42L)),
      (2L, upscaled(42L)),                        // 2× upscale of 1
      (3L, Multimodal.grayPatternPng(9, 8, 301L)), // different image
      (4L, "not a png".getBytes))                 // undecodable
      .toDF("id", "content")
    val hs = Multimodal.dHash(payloads, "id")
      .select("id", "hi", "lo").as[(Long, Option[Long], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    hs(2L) shouldBe hs(1L)
    hs(3L) should not be hs(1L)
    hs(4L) shouldBe ((None, None)) // quarantined, not dropped
    val pairs = Multimodal.dHashNearDuplicates(payloads, "id")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    pairs should contain((1L, 2L, 0L))
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  it should "hash images spectrally: WHT coefficients, exact brightness invariance, banded near-dup" in {
    // a GLOBAL brightness shift moves only the DC coefficient (the ±1
    // basis cancels a constant on every non-DC cell), so the spectral
    // hash is EXACTLY invariant — the low-frequency robustness that
    // motivates the pHash family over gradient-sign dHash
    def png16(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 16)
        img.getRaster.setSample(x, y, 0, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val base = (x: Int, y: Int) => (x * 7 + y * 13 + x * y) % 128
    val payloads = Seq(
      (1L, png16(base)),
      (2L, png16((x, y) => base(x, y) + 50)),     // +50 brightness
      (3L, png16((x, y) => (x * 31 + y * 5) % 200)), // different image
      (4L, "not a png".getBytes))                 // undecodable
      .toDF("id", "content")
    val hs = Multimodal.spectralHash(payloads, "id")
      .select("id", "hi", "lo").as[(Long, Option[Long], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    hs(2L) shouldBe hs(1L) // exact invariance under the +50 shift
    hs(3L) should not be hs(1L)
    hs(4L) shouldBe ((None, None))
    // hand-check one coefficient bit path: W(1,0) on the base image
    val g = Array.tabulate(16, 16)((x, y) => base(x, y).toLong)
    def wht(u: Int, v: Int): Long = {
      var s = 0L
      for (x <- 0 until 16; y <- 0 until 16) {
        val neg = (Integer.bitCount(x & u) + Integer.bitCount(y & v)) % 2 == 1
        s += (if (neg) -g(x)(y) else g(x)(y))
      }
      s
    }
    val coeffs = (for (u <- 0 until 8; v <- 0 until 8)
      yield (v * 8 + u) -> wht(u, v)).sortBy(_._1).map(_._2)
    val med = coeffs.drop(1).sorted.apply(31)
    val expectBit1 = coeffs(1) > med // b = 1 is (u=1, v=0)
    val lo1 = hs(1L)._2.get
    ((lo1 >> 1) & 1L) shouldBe (if (expectBit1) 1L else 0L)
    // banded near-dup finds the planted brightness twin at Hamming 0
    val pairs = Multimodal.spectralHashNearDuplicates(payloads, "id")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)]
      .collect()
    pairs should contain((1L, 2L, 0L))
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  it should "keep the spectral hash exactly scale-invariant and robust to small translation" in {
    // the pHash family's CLAIM is crop/scale robustness — pin it:
    // (a) a 2x-per-axis upscale box-averages back to the identical
    // 16x16 grid (cell [2cx,2cx+2) of the 64-wide image is the same
    // 2x2 original block duplicated 4x, so the floor mean is equal),
    // hence hash equality is EXACT, not approximate;
    // (b) a 1-pixel translate of a SMOOTH image perturbs the
    // low-sequency integer coefficients only slightly, so the hash
    // moves a few bits while a different image stays far
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // a 16-px block scene: a 1-pixel shift moves 1/16 of each feature
    // — the "translate small relative to feature size" regime the
    // pHash family claims (a shift comparable to the feature size is
    // a DIFFERENT image and correctly lands far; measured on this
    // fixture: translate=3, unrelated=32 of 64 bits)
    val base = (x: Int, y: Int) => ((x / 16) * 60 + (y / 16) * 45) % 256
    val payloads = Seq(
      (1L, png(64, 64)(base)),
      (2L, png(128, 128)((x, y) => base(x / 2, y / 2))), // exact 2x upscale
      (3L, png(64, 64)((x, y) => base(math.min(x + 1, 63), y))), // 1-px shift
      (4L, png(64, 64)((x, y) => (x * 31 + y * 5) % 200))) // different
      .toDF("id", "content")
    val hs = Multimodal.spectralHash(payloads, "id")
      .select("id", "hi", "lo").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    hs(2L) shouldBe hs(1L) // upscale: EXACT equality
    val dTrans = hamming(hs(1L), hs(3L))
    val dOther = hamming(hs(1L), hs(4L))
    info(s"spectral hamming: translate=$dTrans other=$dOther")
    dTrans should be <= 3 // inside the banded near-dup radius
    dOther should be > 3
    val pairs = Multimodal.spectralHashNearDuplicates(payloads, "id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    pairs should contain((1L, 2L))
    pairs should contain((1L, 3L))
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 4L))
  }

  it should "decode real WAV audio through javax.sound.sampled to exact stats" in {
    // constant-amplitude mono: mean IS the value, rms its magnitude
    def constWav(v: Int, n: Int, channels: Int): Array[Byte] = {
      val data = new Array[Byte](n * 2 * channels)
      for (i <- 0 until n * channels) {
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels,
        true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val payloads = Seq(
      (1L, constWav(-1234, 50, 1)),
      (2L, constWav(700, 20, 2)),   // stereo: channel count reported
      (3L, "not audio".getBytes))
      .toDF("id", "content")
    val r = Multimodal.decodeWavFeatures(payloads, "id")
      .select("id", "sample_rate", "channels", "n_frames", "mean_amp", "rms")
      .as[(Long, Option[Int], Option[Int], Option[Long], Option[Double],
        Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    r(1L) shouldBe ((1L, Some(8000), Some(1), Some(50L), Some(-1234.0),
      Some(1234.0)))
    r(2L)._3 shouldBe Some(2)
    r(2L)._4 shouldBe Some(20L)
    r(2L)._5 shouldBe Some(700.0)
    r(3L)._2 shouldBe None // quarantined, not dropped
    // the q_m6 generator round-trips bit-exactly
    val gen = Multimodal.decodeWavFeatures(
      Seq((9L, Multimodal.pcmWav(9L, 100))).toDF("id", "content"), "id")
      .select("n_frames").as[Long].head()
    gen shouldBe 100L
  }

  it should "fingerprint audio by energy contour with a banded near-dup join" in {
    // phase inversion (negated samples) preserves every window ENERGY,
    // so the hash must be identical — the invariance that makes this a
    // perceptual fingerprint rather than a byte hash
    def wavOf(samples: Array[Int]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val base = Array.tabulate(650)(i => ((i * i * 37 + i * 11) % 32000) - 16000)
    val payloads = Seq(
      (1L, Multimodal.modulatedWav(42L, 650)),
      (2L, Multimodal.modulatedWav(42L, 650)),  // identical clip
      (3L, wavOf(base)),
      (4L, wavOf(base.map(-_))),                // phase-inverted copy of 3
      (5L, "noise".getBytes))                   // undecodable
      .toDF("id", "content")
    val hs = Multimodal.audioEnergyHash(payloads, "id")
      .select("id", "hi", "lo").as[(Long, Option[Long], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    hs(2L) shouldBe hs(1L)
    hs(4L) shouldBe hs(3L) // energy is sign-invariant
    hs(5L) shouldBe ((None, None))
    val pairs = Multimodal.audioNearDuplicates(payloads, "id")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    pairs should contain((1L, 2L, 0L))
    pairs should contain((3L, 4L, 0L))
  }

  it should "rebalance partitions without losing rows or columns" in {
    val parts = Multimodal.repartitionBySize(media, 2)
    parts.count() shouldBe 3 // layout-only change
    parts.columns shouldBe media.columns
    parts.rdd.getNumPartitions shouldBe 2
    // round-robin spreads the rows over both partitions
    parts.rdd.mapPartitions(it => Iterator(it.size)).collect().max should be <= 2
  }
}
