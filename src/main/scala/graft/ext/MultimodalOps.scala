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
      case None      => hashFeature(bytes, format, dim)
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

  /** Video frame-sampling plumbing: explode a (stubbed) frame index list —
    * one output row per sampled frame, payload carried by reference
    * (offset), not copied. Real frame extraction would slice the container
    * at the returned offsets. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L),
          coalesce(col("meta.duration_ms"), lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"))

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
