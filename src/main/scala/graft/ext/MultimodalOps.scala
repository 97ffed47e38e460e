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
 * The actual codec calls are STUBBED with a deterministic fake (this
 * container ships no image/audio libs — clearly marked below); everything
 * around them — schema, batching, partitioning, null-safety — is real.
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
   * lambda sees an iterator over a whole partition, amortizing any native
   * library setup across the batch. Returns small fixed-width features; the
   * payload is dropped on output.
   *
   * ??? STUB ???  `decodeToFeature` stands in for a real codec call
   * (e.g. libjpeg decode + CLIP embed). It is a deterministic fake —
   * a seeded hash-driven vector — so tests exercise real plumbing with
   * stable outputs. Swap the body for the real codec in production.
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

  /** STUB — deterministic fake decode: seeds a per-payload PRNG from the
    * content hash and emits a unit-norm vector. Replace with a real
    * decoder+embedder; the signature (bytes, format) → fixed-dim floats is
    * the production contract. */
  private def decodeToFeature(bytes: Array[Byte], format: String,
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
   * Resize plumbing — same per-partition batch shape as [[extractFeatures]]
   * (codec init amortized across the batch, payload-in → payload-out).
   *
   * ??? STUB ???  `resizePayload` stands in for a real image resize
   * (libvips/Pillow-SIMD equivalent). The fake is deterministic —
   * truncate/cycle the payload to a size proportional to the target area —
   * so tests exercise the real plumbing (batch iteration, metadata rewrite,
   * payload replacement) with stable outputs.
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

  /** STUB — deterministic fake resize: emits ceil(area/64) bytes cycled
    * from the source payload. Replace with a real decoder+scaler; the
    * (bytes, w, h) → bytes signature is the production contract. */
  private def resizePayload(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
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
