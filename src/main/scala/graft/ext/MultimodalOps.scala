package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * [EXT] Multimodal (image/audio/video) column support. North-star mandate.
 *
 * Design: media payloads are opaque `binary` columns travelling next to a
 * typed metadata struct — the same layout Spark's own `image` source and
 * every large-scale multimodal corpus (LAION/WebDataset-on-parquet) use.
 * Operations:
 *   - schema + ingestion plumbing (real, tested)
 *   - decode / feature-extract / resize / frame-sample as per-partition
 *     batch functions (the Scala analog of `mapInPandas`: one call per
 *     batch of rows, vectorization-friendly, no per-row JVM↔native churn)
 *
 * Image decode/resize are REAL, via the JDK's own `javax.imageio` (no
 * external jars): PNG/JPEG/BMP/GIF payloads are decoded to pixels for
 * feature extraction and rescaled through Graphics2D. Payloads ImageIO
 * cannot read (audio/video containers, synthetic test bytes) fall back to
 * a deterministic content-hash feature so the plumbing stays total — the
 * same iterator shape either way.
 *
 * Scale notes: media bytes dominate row size, so ops that don't need the
 * payload must never deserialize it — metadata lives in its own columns so
 * Parquet column pruning skips the blobs entirely. Decode is CPU-bound ⇒
 * `repartition` to cores before decoding, and decoded features (small)
 * should be written WITHOUT the payload column.
 */
object MultimodalOps {

  /** media metadata struct — typed, prunable independently of the payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  final case class MediaRow(media_id: Long, payload: Array[Byte],
                            media_type: String, format: String)

  final case class MediaFeatures(media_id: Long, n_bytes: Int,
                                 content_hash: String,
                                 feature: Array[Float])

  /** Payload-free projection — demonstrates the layout contract: metadata
    * queries must compile to a scan whose ReadSchema excludes `payload`. */
  def metaOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("meta.media_type"), col("meta.format"),
      col("meta.width"), col("meta.height"))

  /** Cheap payload stats that DON'T need a codec: size + content hash —
    * exact dedup of media blobs, same shape as text dedup. */
  def payloadStats(df: DataFrame): DataFrame =
    df.select(col("media_id"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("content_hash"))

  // -------------------------------------------------------------------------
  // Decode / feature extraction — per-partition batch processing
  // -------------------------------------------------------------------------

  /**
   * Feature extraction over batches — Scala analog of `mapInPandas`: the
   * lambda sees an iterator over a whole partition, amortizing codec setup
   * across the batch. Returns small fixed-width features; the payload is
   * dropped on output.
   *
   * Decode is real (`javax.imageio`): an ImageIO-readable payload yields a
   * unit-norm luminance histogram over `dim` bins — a genuine
   * pixels-in/vector-out embedding contract (swap the histogram for a CLIP
   * forward pass in production; the (bytes, format) → floats signature is
   * the seam). Undecodable payloads get a deterministic content-hash
   * vector so mixed-modality batches never throw.
   */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      // per-partition (per-batch) one-time setup would go here (codec init)
      batch.map { m =>
        val bytes = Option(m.payload).getOrElse(Array.emptyByteArray)
        MediaFeatures(
          media_id = m.media_id,
          n_bytes = bytes.length,
          content_hash = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString,
          feature = decodeToFeature(bytes, m.format, dim))
      }
    }
  }

  /** Decompression-bomb guard: a tiny PNG can declare a huge canvas, and
    * ImageIO allocates width*height ints before any pixel is read. Reject
    * declared dimensions above this pixel count before decoding. */
  private[graft] val maxDecodePixels: Long = 64L * 1024 * 1024

  /** Real decode via the JDK's ImageIO. Returns None when no registered
    * reader accepts the bytes (audio/video containers, corrupt blobs) or
    * the declared dimensions exceed [[maxDecodePixels]]. Only IO/runtime
    * failures are converted to None — fatal JVM errors propagate. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val declared = reader.getWidth(0).toLong * reader.getHeight(0).toLong
            if (declared <= 0 || declared > maxDecodePixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  private[graft] def decodeToFeature(bytes: Array[Byte], format: String,
                                   dim: Int): Array[Float] =
    decodeImage(bytes) match {
      case Some(img) => luminanceHistogram(img, dim)
      case None => decodeAudio(bytes) match {
        case Some(samples) => rmsWindowFeature(samples, dim)
        case None          => hashFeature(bytes, format, dim)
      }
    }

  /** Decode cap for audio: bounds the PCM buffer a hostile header can
    * demand (the audio analog of [[maxDecodePixels]]). */
  private[graft] val maxAudioBytes: Long = 64L * 1024 * 1024

  /**
   * Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU —
   * the PCM containers the JDK ships codecs for; zero external jars, the
   * same trick as ImageIO for images). The stream is converted to 16-bit
   * signed PCM so sample math is uniform across source encodings, and
   * read under [[maxAudioBytes]]. Returns None when no installed reader
   * accepts the bytes (images, video containers, synthetic test blobs) —
   * only IO/runtime failures are swallowed, fatal JVM errors propagate.
   */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[Array[Double]] =
    if (bytes == null || bytes.length < 16) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val base = ais.getFormat
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, ais)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var total = 0L
          var n = pcm.read(buf)
          while (n > 0 && total <= maxAudioBytes) {
            out.write(buf, 0, n); total += n; n = pcm.read(buf)
          }
          if (total == 0 || total > maxAudioBytes) None
          else {
            val b = out.toByteArray
            val samples = new Array[Double](b.length / 2)
            var i = 0
            while (i < samples.length) {
              // little-endian 16-bit signed → [-1, 1)
              samples(i) =
                (((b(2 * i + 1) << 8) | (b(2 * i) & 0xff)).toShort) / 32768.0
              i += 1
            }
            Some(samples)
          }
        } finally pcm.close()
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: RuntimeException => None
    }

  /** Unit-norm RMS-window feature: the sample stream split into `dim`
    * equal windows, RMS energy per window — a real audio embedding
    * contract (tones, silence, and envelopes separate; a re-decode of the
    * same samples reproduces the same vector). */
  private[graft] def rmsWindowFeature(samples: Array[Double], dim: Int): Array[Float] = {
    val bins = new Array[Float](dim)
    if (samples.length > 0) {
      var w = 0
      while (w < dim) {
        val lo = (samples.length.toLong * w / dim).toInt
        val hi = (samples.length.toLong * (w + 1) / dim).toInt
        var acc = 0.0
        var i = lo
        while (i < hi) { acc += samples(i) * samples(i); i += 1 }
        bins(w) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0f
        w += 1
      }
    }
    val n = math.sqrt(bins.map(b => b.toDouble * b).sum).toFloat max 1e-9f
    bins.map(_ / n)
  }

  /** Unit-norm luminance histogram — a real pixel-space feature: images
    * with different content produce different vectors, a re-encode of the
    * same pixels produces the same vector. */
  private def luminanceHistogram(img: java.awt.image.BufferedImage,
                                 dim: Int): Array[Float] = {
    val bins = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000 // integer Rec.601 luma, 0..255
        bins(lum * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.sqrt(bins.map(b => b.toDouble * b).sum).toFloat max 1e-9f
    bins.map(_ / n)
  }

  /** Fallback for non-image payloads: deterministic content-hash unit
    * vector, so mixed-modality batches stay total and test outputs stable. */
  private def hashFeature(bytes: Array[Byte], format: String,
                          dim: Int): Array[Float] = {
    val seed = java.util.Arrays.hashCode(bytes).toLong ^ format.##.toLong
    val rng = new java.util.Random(seed)
    val raw = Array.fill(dim)(rng.nextGaussian().toFloat)
    val n = math.sqrt(raw.map(x => x * x).sum).toFloat max 1e-9f
    raw.map(_ / n)
  }

  final case class ResizedMedia(media_id: Long, payload: Array[Byte],
                                width: Int, height: Int)

  /**
   * Resize — same per-partition batch shape as [[extractFeatures]] (codec
   * init amortized across the batch, payload-in → payload-out). Real for
   * ImageIO-readable payloads: decode → Graphics2D bilinear rescale →
   * re-encode as PNG at the target dimensions. Undecodable payloads keep
   * the deterministic byte-cycling fallback so the operator stays total.
   */
  def resize(spark: SparkSession, media: Dataset[MediaRow],
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      // per-partition codec setup would go here
      batch.map { m =>
        val bytes = Option(m.payload).getOrElse(Array.emptyByteArray)
        ResizedMedia(m.media_id, resizePayload(bytes, targetW, targetH),
          targetW, targetH)
      }
    }
  }

  private[graft] def resizePayload(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    decodeImage(bytes) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        // write returns false when no registered writer accepts the image —
        // fall back rather than silently emit an empty payload
        if (javax.imageio.ImageIO.write(out, "png", baos) && baos.size() > 0)
          baos.toByteArray
        else cyclingFallback(bytes, w, h)
      case None =>
        cyclingFallback(bytes, w, h)
    }

  /** Non-image payload (or writer failure): deterministic byte-cycling
    * fallback keeps the operator total over mixed-modality batches. */
  private def cyclingFallback(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(w * h / 64, 1)
    if (bytes.isEmpty) new Array[Byte](n)
    else Array.tabulate[Byte](n)(i => bytes(i % bytes.length))
  }

  /** Frame-sampling PLANNING: explode the frame-offset list from metadata —
    * one output row per sampled timestamp, payload untouched (pure
    * projection over the metadata columns, so the parquet scan prunes the
    * blobs). This plans WHICH offsets to decode; [[extractFrames]] is the
    * real pixels-out extraction for containers the JDK decodes. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L),
          coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"))

  final case class FrameFeatures(media_id: Long, frame_idx: Int,
                                 n_frames: Int, feature: Array[Float])

  /** Frame-count cap: bounds the decode work a hostile multi-frame
    * container can demand (the temporal analog of [[maxDecodePixels]]). */
  private[graft] val maxDecodeFrames: Int = 4096

  /**
   * REAL multi-frame extraction: ImageIO's sequence API
   * (`reader.getNumImages(true)` / `read(i)`) decodes every frame of a
   * multi-frame container — GIF is the JDK-native one (the same seam
   * takes MJPEG/APNG when a reader jar is registered). Every `everyN`-th
   * frame is decoded to pixels and embedded via the same luminance
   * histogram as still images; single-frame payloads yield frame 0 only;
   * payloads no reader accepts yield NO rows (dropped, not faked — honest
   * output for a decode operator). Same per-partition batch shape as
   * [[extractFeatures]]; bomb guards: [[maxDecodePixels]] per frame,
   * [[maxDecodeFrames]] per payload.
   */
  def extractFrames(spark: SparkSession, media: Dataset[MediaRow],
                    everyN: Int, dim: Int = 8): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(everyN > 0, "frame sampling stride must be positive")
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        decodeFramesSampled(m.payload, everyN).map { case (idx, n, img) =>
          FrameFeatures(m.media_id, idx, n, luminanceHistogram(img, dim))
        }
      }
    }
  }

  /** Decode every `everyN`-th frame of a multi-frame payload: returns
    * (frame index, total frames, pixels). Empty when no reader accepts
    * the bytes; frames that individually fail the bomb guard are skipped. */
  private[graft] def decodeFramesSampled(bytes: Array[Byte], everyN: Int)
      : Seq[(Int, Int, java.awt.image.BufferedImage)] =
    if (bytes == null || bytes.isEmpty) Seq.empty
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true) // seekForwardOnly=false: random frame access
            val n = math.min(reader.getNumImages(true), maxDecodeFrames)
            (0 until n by everyN).flatMap { i =>
              try {
                val declared = reader.getWidth(i).toLong * reader.getHeight(i).toLong
                if (declared <= 0 || declared > maxDecodePixels) None
                else Option(reader.read(i)).map(img => (i, n, img))
              } catch {
                case _: java.io.IOException | _: RuntimeException => None
              }
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: java.io.IOException | _: RuntimeException => Seq.empty }

  final case class MediaHash(media_id: Long, ahash: Long, decoded: Boolean)

  /**
   * 64-bit perceptual AVERAGE-HASH (aHash) per image: decode → bilinear
   * 8×8 grayscale downsample → bit k set iff cell luma > image mean. Two
   * images that differ by re-encoding, mild resizing, or small edits land
   * within a few bits of Hamming distance — the standard cheap
   * image-near-dup signature (pHash's DCT refines the same idea).
   * Undecodable payloads get a content-hash fallback with decoded=false so
   * the operator stays total; near-dup pairing filters them out.
   *
   * Per-partition batch map (codec init amortized), ZERO shuffle.
   */
  def imageAHash(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val bytes = Option(m.payload).getOrElse(Array.emptyByteArray)
        decodeImage(bytes) match {
          case Some(img) => MediaHash(m.media_id, aHashOf(img), decoded = true)
          case None =>
            // stable 64-bit content hash keeps the row; never pairs
            MediaHash(m.media_id,
              java.util.Arrays.hashCode(bytes).toLong, decoded = false)
        }
      }
    }
  }

  private[graft] def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
    } finally g.dispose()
    val luma = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val rgb = small.getRGB(k % 8, k / 8)
      luma(k) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
      k += 1
    }
    val mean = luma.sum / 64
    var hash = 0L
    k = 0
    while (k < 64) {
      if (luma(k) > mean) hash |= (1L << k)
      k += 1
    }
    hash
  }

  final case class MediaDctHash(media_id: Long, phash: Long, decoded: Boolean)

  /**
   * 63-bit DCT perceptual hash (pHash) per image — the frequency-domain
   * refinement of [[imageAHash]]: decode → bilinear 32×32 grayscale →
   * 2-D DCT-II → the low-frequency 8×8 block minus the DC term → bit k
   * set iff that AC coefficient exceeds the block median. Dropping DC
   * makes the signature invariant to GLOBAL brightness/contrast shifts
   * that move every aHash luma (and its mean) nonlinearly after
   * clipping; low-frequency-only makes it robust to blur/re-encode
   * noise. Same contract as aHash otherwise: undecodable payloads get a
   * content-hash fallback with decoded=false, pairing filters them.
   *
   * Per-partition batch map (codec init amortized), ZERO shuffle; the
   * DCT computes only the needed 8×8 block — 64 coefficients × 1024
   * pixels per image, not a full 32×32 transform.
   */
  def imagePHash(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaDctHash] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val bytes = Option(m.payload).getOrElse(Array.emptyByteArray)
        decodeImage(bytes) match {
          case Some(img) => MediaDctHash(m.media_id, pHashOf(img), decoded = true)
          case None =>
            MediaDctHash(m.media_id,
              java.util.Arrays.hashCode(bytes).toLong, decoded = false)
        }
      }
    }
  }

  private[graft] def pHashOf(img: java.awt.image.BufferedImage): Long = {
    val n = 32
    val small = new java.awt.image.BufferedImage(
      n, n, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, n, n, null)
    } finally g.dispose()
    val luma = new Array[Double](n * n)
    var k = 0
    while (k < n * n) {
      val rgb = small.getRGB(k % n, k / n)
      luma(k) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000.0
      k += 1
    }
    // DCT-II, low-frequency 8×8 block only (fixed loop order — bit-stable)
    val coeffs = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) {
            s += luma(y * n + x) *
              math.cos((2 * y + 1) * u * math.Pi / (2.0 * n)) *
              math.cos((2 * x + 1) * v * math.Pi / (2.0 * n))
            x += 1
          }
          y += 1
        }
        // quantize: numerically-zero coefficients (flat images, separable
        // gradients) must not contribute noise bits around the median
        coeffs(u * 8 + v) = math.rint(s * 1e6) / 1e6
        v += 1
      }
      u += 1
    }
    val ac = coeffs.drop(1) // 63 AC coefficients; DC carries brightness
    val med = ac.sorted.apply(31)
    var hash = 0L
    k = 0
    while (k < 63) {
      if (ac(k) > med) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /**
   * Near-duplicate IMAGE pairs: aHash signatures → the generic banded
   * Hamming join ([[DedupOps.hammingNearDupPairs]] — pigeonhole-exact for
   * maxHamming < bands, O(images × bands) shuffle of 16-byte rows, the
   * payloads never shuffle). Returns (id1, id2, hamming). The decode pass
   * is the cost; everything after runs on 8-byte signatures.
   */
  def imageNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBandDf: Int = Int.MaxValue): DataFrame = {
    val sig = imageAHash(spark, media).filter(_.decoded).toDF()
    graft.ext.DedupOps.hammingNearDupPairs(sig, "media_id", "ahash",
      bits = 64, bands = bands, maxHamming = maxHamming, maxBandDf = maxBandDf)
  }

  /** [[imageNearDupPairs]] on the DCT signature ([[imagePHash]]) — same
    * banded-Hamming contract; catches brightness/contrast-shifted copies
    * the spatial aHash scatters. */
  def imagePHashNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
                             maxHamming: Int = 6, bands: Int = 8,
                             maxBandDf: Int = Int.MaxValue): DataFrame = {
    val sig = imagePHash(spark, media).filter(_.decoded).toDF()
    graft.ext.DedupOps.hammingNearDupPairs(sig, "media_id", "phash",
      bits = 64, bands = bands, maxHamming = maxHamming, maxBandDf = maxBandDf)
  }

  /**
   * 64-bit perceptual ENVELOPE-HASH per audio payload — the aHash idea in
   * the time domain: decode to PCM, 64 unit-norm RMS energy windows, bit
   * k set iff window k's energy exceeds the mean window energy. Volume
   * scaling cancels (unit-norm + mean threshold), so a re-encode or
   * re-gained copy of the same material lands within a few Hamming bits,
   * while different material (tones vs silence vs other envelopes)
   * diverges. Undecodable payloads keep a content-hash row with
   * decoded=false, like [[imageAHash]]. Per-partition batch map, ZERO
   * shuffle.
   */
  def audioEnvelopeHash(spark: SparkSession,
                        media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val bytes = Option(m.payload).getOrElse(Array.emptyByteArray)
        decodeAudio(bytes) match {
          case Some(samples) =>
            val bins = rmsWindowFeature(samples, 64)
            val mean = bins.map(_.toDouble).sum / 64.0
            var hash = 0L
            var k = 0
            while (k < 64) {
              if (bins(k) > mean) hash |= (1L << k)
              k += 1
            }
            MediaHash(m.media_id, hash, decoded = true)
          case None =>
            MediaHash(m.media_id,
              java.util.Arrays.hashCode(bytes).toLong, decoded = false)
        }
      }
    }
  }

  /** Near-duplicate AUDIO pairs: envelope hashes → the generic banded
    * Hamming join — identical contract to [[imageNearDupPairs]] (the
    * payloads never shuffle; everything after the decode pass runs on
    * 8-byte signatures). */
  def audioNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
                        maxHamming: Int = 6, bands: Int = 8,
                        maxBandDf: Int = Int.MaxValue): DataFrame = {
    val sig = audioEnvelopeHash(spark, media).filter(_.decoded).toDF()
    graft.ext.DedupOps.hammingNearDupPairs(sig, "media_id", "ahash",
      bits = 64, bands = bands, maxHamming = maxHamming, maxBandDf = maxBandDf)
  }

  /** Strip leading/trailing samples whose amplitude is ≤ `frac` of the
    * clip's peak — the canonicalization that makes silence padding (the
    * common time shift between otherwise-identical copies) cancel exactly
    * before any windowing. */
  private[graft] def trimSilence(samples: Array[Double],
                                 frac: Double): Array[Double] = {
    if (samples.isEmpty) return samples
    var peak = 0.0
    var i = 0
    while (i < samples.length) {
      val a = math.abs(samples(i)); if (a > peak) peak = a; i += 1
    }
    val thr = peak * frac
    var lo = 0
    while (lo < samples.length && math.abs(samples(lo)) <= thr) lo += 1
    var hi = samples.length - 1
    while (hi >= lo && math.abs(samples(hi)) <= thr) hi -= 1
    if (hi < lo) samples
    else java.util.Arrays.copyOfRange(samples, lo, hi + 1)
  }

  /**
   * SHIFT-TOLERANT audio envelope hash: [[audioEnvelopeHash]] is
   * volume-invariant but time-shift sensitive — a 0.1 s-padded copy
   * re-grids all 64 windows and scatters the bits past any useful
   * maxHamming. Two mitigations compose here: [[trimSilence]] (silence
   * padding — the common shift — cancels exactly, since the active region
   * re-aligns), then 256 fine RMS windows MAX-POOLED 4→1 into the 64 bins
   * (a residual sub-window drift moves energy within a pool instead of
   * across bin boundaries, so isolated bits flip instead of the whole
   * hash). Same contract and cost shape as [[audioEnvelopeHash]]: per-
   * partition batch map, ZERO shuffle, content-hash fallback rows with
   * decoded=false for undecodable payloads.
   */
  def audioEnvelopeHashPooled(spark: SparkSession, media: Dataset[MediaRow],
                              trimFrac: Double = 0.02): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val bytes = Option(m.payload).getOrElse(Array.emptyByteArray)
        decodeAudio(bytes) match {
          case Some(samples) =>
            val fine = rmsWindowFeature(trimSilence(samples, trimFrac), 256)
            val bins = new Array[Float](64)
            var k = 0
            while (k < 64) {
              var p = 0; var mx = 0f
              while (p < 4) {
                val v = fine(4 * k + p); if (v > mx) mx = v; p += 1
              }
              bins(k) = mx
              k += 1
            }
            val mean = bins.map(_.toDouble).sum / 64.0
            var hash = 0L
            k = 0
            while (k < 64) {
              if (bins(k) > mean) hash |= (1L << k)
              k += 1
            }
            MediaHash(m.media_id, hash, decoded = true)
          case None =>
            MediaHash(m.media_id,
              java.util.Arrays.hashCode(bytes).toLong, decoded = false)
        }
      }
    }
  }

  /** Near-duplicate AUDIO pairs under the shift-tolerant hash — catches
    * silence-padded / re-gained copies the strict envelope hash scatters;
    * same banded Hamming join and cost contract as [[audioNearDupPairs]]. */
  def audioNearDupPairsShiftTolerant(spark: SparkSession,
                                     media: Dataset[MediaRow],
                                     maxHamming: Int = 6, bands: Int = 8,
                                     maxBandDf: Int = Int.MaxValue): DataFrame = {
    val sig = audioEnvelopeHashPooled(spark, media).filter(_.decoded).toDF()
    graft.ext.DedupOps.hammingNearDupPairs(sig, "media_id", "ahash",
      bits = 64, bands = bands, maxHamming = maxHamming, maxBandDf = maxBandDf)
  }

  /** Synthesizes a deterministic in-memory media table for tests/demo (no
    * media fixtures ship in /root/testdata). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val payload = Array.tabulate[Byte](64 + i % 32)(j => ((i * 31 + j) % 127).toByte)
      (i.toLong, payload, "image", "png", 640, 480, (i % 5) * 1000L, 0)
    }
    rows.toDF("media_id", "payload", "media_type", "format", "width",
        "height", "duration_ms", "sample_rate")
      .select(col("media_id"), col("payload"),
        struct(col("media_type"), col("format"), col("width"), col("height"),
          col("duration_ms"), col("sample_rate")).as("meta"))
  }
}
