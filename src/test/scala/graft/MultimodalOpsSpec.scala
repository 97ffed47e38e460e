package graft

import graft.ext.MultimodalOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("metaOnly on parquet prunes the payload column from the scan") {
    val dir = Files.createTempDirectory("graft_media_").toString
    MultimodalOps.syntheticMedia(spark, 100).write.mode("overwrite").parquet(dir)
    val plan = MultimodalOps.metaOnly(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    plan should include("ReadSchema")
    // blob column must not be read for a metadata-only query
    plan.split("ReadSchema").last should not include "payload"
  }

  test("payloadStats computes size + content hash without a codec") {
    val media = MultimodalOps.syntheticMedia(spark, 10)
    val out = MultimodalOps.payloadStats(media).orderBy("media_id").collect()
    out.length shouldBe 10
    out(0).getAs[Int]("n_bytes") shouldBe 64
    out(0).getAs[String]("content_hash") should fullyMatch regex "[0-9a-f]{32}"
    // identical payloads hash identically (exact blob dedup contract)
    val dup = MultimodalOps.payloadStats(media.unionAll(media))
      .groupBy("content_hash").count().filter(col("count") =!= 2).count()
    dup shouldBe 0L
  }

  /** A real PNG: solid color or horizontal luminance gradient. */
  private def png(w: Int, h: Int, rgb: Int, gradient: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = if (gradient) { val g = x * 255 / math.max(w - 1, 1); (g << 16) | (g << 8) | g }
                else rgb
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeImage rejects declared decompression-bomb dimensions before allocating") {
    // a syntactically valid PNG header (magic + CRC-correct IHDR) declaring
    // a 10^12-pixel canvas — must be rejected from the header alone
    val baos = new java.io.ByteArrayOutputStream()
    baos.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(1000000).putInt(1000000)          // width, height
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32(); crc.update(ihdr.array())
    baos.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
    baos.write(ihdr.array())
    baos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    MultimodalOps.decodeImage(baos.toByteArray) shouldBe None
    // a normal-size PNG still decodes through the same guarded path
    MultimodalOps.decodeImage(png(16, 16, 0x336699)).isDefined shouldBe true
  }

  test("extractFeatures decodes real PNGs: pixel-derived, re-encode-stable features") {
    import MultimodalOps.{MediaFeatures, MediaRow}
    val dark = png(16, 16, 0x101010)
    val bright = png(16, 16, 0xf0f0f0)
    val grad = png(16, 16, 0, gradient = true)
    val media = Seq(
      MediaRow(0L, dark, "image", "png"),
      MediaRow(1L, bright, "image", "png"),
      MediaRow(2L, grad, "image", "png")).toDS()
    val f: Map[Long, Array[Float]] =
      MultimodalOps.extractFeatures(spark, media, dim = 8)
        .collect().map((mf: MediaFeatures) => mf.media_id -> mf.feature).toMap
    // solid dark → all mass in the lowest luminance bin; bright → highest
    f(0L)(0) shouldBe 1.0f +- 1e-5f
    f(1L)(7) shouldBe 1.0f +- 1e-5f
    // gradient spreads mass across bins — differs from both solids
    f(2L).count(_ > 0f) should be > 2
    // feature is a function of PIXELS: the normalized histogram of a solid
    // image is invariant under rescale even though the bytes differ
    val rescaled = MultimodalOps.resizePayload(dark, 32, 32)
    rescaled.toSeq should not be dark.toSeq
    MultimodalOps.decodeToFeature(rescaled, "png", 8).toSeq shouldBe f(0L).toSeq
  }

  test("resize decodes, rescales and re-encodes real PNGs") {
    val grad = png(100, 50, 0, gradient = true)
    val out = MultimodalOps.resizePayload(grad, 32, 16)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    img.getWidth shouldBe 32
    img.getHeight shouldBe 16
    // bilinear rescale preserves the gradient direction: left darker than right
    (img.getRGB(0, 8) & 0xff) should be < (img.getRGB(31, 8) & 0xff)
    // solid color survives the rescale exactly
    val solid = MultimodalOps.resizePayload(png(40, 40, 0x336699), 8, 8)
    val simg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(solid))
    (simg.getRGB(4, 4) & 0xffffff) shouldBe 0x336699
  }

  test("extractFeatures: per-partition batch plumbing, hash fallback for non-image payloads") {
    import MultimodalOps.MediaRow
    val media = MultimodalOps.syntheticMedia(spark, 20)
      .select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type"), col("meta.format").as("format"))
      .as[MediaRow]
    val feats = MultimodalOps.extractFeatures(spark, media, dim = 8).collect()
    feats.length shouldBe 20
    all(feats.map(_.feature.length)) shouldBe 8
    // stub decode is deterministic and unit-norm
    val norms = feats.map(f => math.sqrt(f.feature.map(x => x * x).sum))
    all(norms) shouldBe 1.0 +- 1e-5
    val again = MultimodalOps.extractFeatures(spark, media, dim = 8).collect()
    feats.sortBy(_.media_id).map(_.feature.toSeq) shouldBe
      again.sortBy(_.media_id).map(_.feature.toSeq)
  }

  test("resize: batch payload rewrite, deterministic fallback for non-image payloads") {
    import MultimodalOps.MediaRow
    val media = MultimodalOps.syntheticMedia(spark, 8)
      .select(col("media_id"), col("payload"),
        col("meta.media_type").as("media_type"), col("meta.format").as("format"))
      .as[MediaRow]
    val resized = MultimodalOps.resize(spark, media, 64, 64).collect()
    resized.length shouldBe 8
    all(resized.map(_.width)) shouldBe 64
    all(resized.map(_.payload.length)) shouldBe 64 * 64 / 64
    val again = MultimodalOps.resize(spark, media, 64, 64).collect()
    resized.sortBy(_.media_id).map(_.payload.toSeq) shouldBe
      again.sortBy(_.media_id).map(_.payload.toSeq)
  }

  test("sampleFrames explodes one row per sampled frame offset") {
    val media = MultimodalOps.syntheticMedia(spark, 5)
    val frames = MultimodalOps.sampleFrames(media, everyMs = 1000L)
    // media_id i has duration (i % 5) * 1000 ms → (i % 5) + 1 frames
    frames.groupBy("media_id").count().orderBy("media_id")
      .as[(Long, Long)].collect() shouldBe
      Array((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
  }

  /** A real WAV: 16-bit mono PCM of a sine tone (amplitude 0 = silence). */
  private def wav(freq: Double, amp: Double = 0.4, n: Int = 8000,
                  rate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("decodeAudio decodes a real WAV to PCM samples; non-audio bytes fall through") {
    val tone = wav(440)
    val samples = MultimodalOps.decodeAudio(tone)
    samples shouldBe defined
    samples.get.length shouldBe 8000
    // decoded amplitude matches the synthesized one
    samples.get.map(math.abs).max shouldBe 0.4 +- 0.01
    // images and garbage are not audio
    MultimodalOps.decodeAudio(png(16, 16, 0x336699)) shouldBe None
    MultimodalOps.decodeAudio(Array.tabulate[Byte](256)(_.toByte)) shouldBe None
    MultimodalOps.decodeAudio(null) shouldBe None
  }

  test("audio features are REAL: RMS-window vectors from decoded samples, not the hash fallback") {
    import MultimodalOps.MediaRow
    val tone = wav(440)
    // the decode path was taken: the feature equals the RMS-window vector
    // of the decoded samples (the hash fallback is seeded differently)
    val feat = MultimodalOps.decodeToFeature(tone, "wav", 8)
    feat.toSeq shouldBe MultimodalOps.rmsWindowFeature(
      MultimodalOps.decodeAudio(tone).get, 8).toSeq
    // a constant-envelope tone spreads RMS evenly: every window ≈ 1/√8
    all(feat.map(_.toDouble)) shouldBe (1.0 / math.sqrt(8)) +- 0.02
    // a half-silent clip concentrates energy in the first windows
    val halfTone = wav(440, n = 4000) // 0.5 s tone
    val half = {
      val full = MultimodalOps.decodeAudio(halfTone).get
      MultimodalOps.rmsWindowFeature(full ++ new Array[Double](4000), 8)
    }
    half.take(4).map(_.toDouble).sum should be > 10 * half.drop(4).map(_.toDouble).sum
    // end-to-end through the batch operator, mixed with an image row
    val media = Seq(
      MediaRow(0L, tone, "audio", "wav"),
      MediaRow(1L, png(16, 16, 0xf0f0f0), "image", "png")).toDS()
    val out = MultimodalOps.extractFeatures(spark, media, dim = 8)
      .collect().map(f => f.media_id -> f.feature).toMap
    out(0L).toSeq shouldBe feat.toSeq
    out(1L)(7) shouldBe 1.0f +- 1e-5f // image row still takes the image path
  }

  /** A real animated GIF: one solid frame per color, via ImageIO's
    * sequence writer. */
  private def gif(colors: Seq[Int], w: Int = 16, h: Int = 16): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
        finally g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    baos.toByteArray
  }

  test("extractFrames decodes every frame of a real animated GIF") {
    import MultimodalOps.MediaRow
    val bytes = gif(Seq(0x101010, 0xf0f0f0, 0x101010, 0xf0f0f0))
    val frames = MultimodalOps.decodeFramesSampled(bytes, everyN = 1)
    frames.map(_._1) shouldBe Seq(0, 1, 2, 3)
    frames.map(_._2).distinct shouldBe Seq(4)
    // stride sampling takes every Nth frame
    MultimodalOps.decodeFramesSampled(bytes, everyN = 2).map(_._1) shouldBe Seq(0, 2)
    // a still PNG is a 1-frame payload; garbage decodes to no rows
    MultimodalOps.decodeFramesSampled(png(8, 8, 0x336699), 1).map(_._1) shouldBe Seq(0)
    MultimodalOps.decodeFramesSampled(Array.tabulate[Byte](64)(_.toByte), 1) shouldBe empty

    // end-to-end: dark and bright frames produce distinct REAL features
    val ds = Seq(MediaRow(7L, bytes, "video", "gif")).toDS()
    val out = MultimodalOps.extractFrames(spark, ds, everyN = 1)
      .collect().sortBy(_.frame_idx)
    out.length shouldBe 4
    all(out.map(_.n_frames)) shouldBe 4
    out(0).feature(0) shouldBe 1.0f +- 1e-5f // dark frame → lowest luma bin
    out(1).feature(7) shouldBe 1.0f +- 1e-5f // bright frame → highest
  }

  /** Gradient PNG with a small square edit at (0,0) — a visual near-dup. */
  private def editedGradient(w: Int, h: Int, editTo: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png(w, h, 0, gradient = true)))
    var y = 0
    while (y < 2) { var x = 0; while (x < 2) { img.setRGB(x, y, editTo); x += 1 }; y += 1 }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("imageAHash: re-encode-stable, edit-tolerant, content-sensitive") {
    import MultimodalOps.MediaRow
    val grad = png(64, 64, 0, gradient = true)
    val gradEdited = editedGradient(64, 64, 0xffffff)
    val inverse = { // right-to-left gradient: very different hash
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = (63 - x) * 255 / 63; img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val ds = Seq(
      MediaRow(1L, grad, "image", "png"),
      MediaRow(2L, gradEdited, "image", "png"),
      MediaRow(3L, inverse, "image", "png"),
      MediaRow(4L, Array[Byte](1, 2, 3), "image", "png")) // undecodable
      .toDS()
    val hashes = MultimodalOps.imageAHash(spark, ds)
      .collect().sortBy(_.media_id)
    hashes.map(_.decoded) shouldBe Array(true, true, true, false)
    val ham = (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b)
    // small edit moves few bits; mirrored content moves many
    ham(hashes(0).ahash, hashes(1).ahash) should be <= 4
    ham(hashes(0).ahash, hashes(2).ahash) should be > 16
  }

  test("imagePHash: brightness-shift invariant where content changes are not") {
    import MultimodalOps.MediaRow
    // gradient capped at 180 so a +60 lift never clips — a PURE DC shift
    // (clipping would flatten the bright side, i.e. change content)
    def cappedGrad(lift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = x * 180 / 63 + lift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val grad = cappedGrad(0)
    val brighter = cappedGrad(60)
    val texture = { // deterministic dense-spectrum content
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = (128 + 90 * math.sin(0.37 * x * y + 0.11 * x)).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val ds = Seq(
      MediaRow(1L, grad, "image", "png"),
      MediaRow(2L, brighter, "image", "png"),
      MediaRow(3L, texture, "image", "png"),
      MediaRow(4L, Array[Byte](1, 2), "image", "png"))
      .toDS()
    val hs = MultimodalOps.imagePHash(spark, ds).collect().sortBy(_.media_id)
    hs.map(_.decoded) shouldBe Array(true, true, true, false)
    val ham = (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b)
    // the DC-free spectrum barely moves under a global brightness lift...
    ham(hs(0).phash, hs(1).phash) should be <= 4
    // ...but genuinely different content rewrites the spectrum
    ham(hs(0).phash, hs(2).phash) should be > 16
    // determinism: same payload, same hash
    MultimodalOps.imagePHash(spark, ds).collect().sortBy(_.media_id)
      .map(_.phash) shouldBe hs.map(_.phash)
  }

  test("imagePHashNearDupPairs pairs the brightness-shifted copy the aHash path scatters") {
    import MultimodalOps.MediaRow
    def cappedGrad(lift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = x * 180 / 63 + lift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val texture = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val g = (128 + 90 * math.sin(0.37 * x * y + 0.11 * x)).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val ds = Seq(
      MediaRow(1L, cappedGrad(0), "image", "png"),
      MediaRow(2L, cappedGrad(60), "image", "png"), // pure DC lift of 1
      MediaRow(3L, texture, "image", "png"),
      MediaRow(4L, Array[Byte](9, 9), "image", "png")) // undecodable
      .toDS()
    val pairs = MultimodalOps.imagePHashNearDupPairs(spark, ds, maxHamming = 6)
      .orderBy("id1", "id2")
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs(0)._3 should be <= 6L
  }

  test("imageNearDupPairs pairs the edited near-dup only, skipping undecodables") {
    import MultimodalOps.MediaRow
    val ds = Seq(
      MediaRow(1L, png(64, 64, 0, gradient = true), "image", "png"),
      MediaRow(2L, editedGradient(64, 64, 0xffffff), "image", "png"),
      MediaRow(3L, png(64, 64, 0x102030), "image", "png"),
      MediaRow(4L, Array[Byte](9, 9), "image", "png"))
      .toDS()
    val pairs = MultimodalOps.imageNearDupPairs(spark, ds, maxHamming = 6)
      .orderBy("id1", "id2")
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs(0)._3 should be <= 6L
  }

  /** A real WAV whose amplitude follows `pattern` (one sine segment per
    * entry; 0 = silence) — distinct envelopes for the envelope hash. */
  private def pulsedWav(pattern: Seq[Int], amp: Double): Array[Byte] = {
    val rate = 8000f
    val seg = 1000
    val n = pattern.length * seg
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val on = pattern(i / seg)
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * on * 32767)
        .toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("audioNearDupPairs: re-gained copies pair, different material doesn't") {
    import MultimodalOps.MediaRow
    val p1 = Seq(1, 1, 0, 0, 1, 0, 1, 0)
    val p2 = Seq(0, 0, 1, 1, 0, 1, 0, 1) // complementary envelope
    val ds = Seq(
      MediaRow(1L, pulsedWav(p1, 0.4), "audio", "wav"),
      MediaRow(2L, pulsedWav(p1, 0.1), "audio", "wav"), // 12 dB quieter copy
      MediaRow(3L, pulsedWav(p2, 0.4), "audio", "wav"),
      MediaRow(4L, Array[Byte](9, 9, 9), "audio", "wav")) // undecodable
      .toDS()
    val hashes = MultimodalOps.audioEnvelopeHash(spark, ds)
      .collect().sortBy(_.media_id)
    hashes.map(_.decoded) shouldBe Array(true, true, true, false)
    val pairs = MultimodalOps.audioNearDupPairs(spark, ds, maxHamming = 6)
      .orderBy("id1", "id2")
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs(0)._3 should be <= 6L
  }

  test("audioNearDupPairsShiftTolerant: a ~0.1s silence-padded copy pairs; the strict hash scatters it") {
    import MultimodalOps.MediaRow
    val pat = Seq(1, 1, 0, 0, 1, 0, 1)
    val orig = pulsedWav(pat, 0.4)
    val padded = pulsedWav(0 +: pat, 0.4) // 0.125 s of leading silence
    val other = pulsedWav(Seq(0, 0, 1, 1, 0, 1, 0), 0.4)
    val ds = Seq(
      MediaRow(1L, orig, "audio", "wav"),
      MediaRow(2L, padded, "audio", "wav"),
      MediaRow(3L, other, "audio", "wav")).toDS()
    // trim cancels the pad exactly (identical active region), max-pooling
    // absorbs residual grid drift: the padded copy pairs with the original
    val pairs = MultimodalOps
      .audioNearDupPairsShiftTolerant(spark, ds, maxHamming = 6)
      .orderBy("id1", "id2").as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs(0)._3 should be <= 6L
    // the strict fixed-grid hash re-bins every window across the ~1/8
    // shift — the same pair lands far outside maxHamming there
    MultimodalOps.audioNearDupPairs(spark, ds, maxHamming = 6)
      .as[(Long, Long, Long)].collect() shouldBe empty
  }
}
