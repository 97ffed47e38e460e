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

  test("extractFeatures: per-partition batch decode plumbing with stub codec") {
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

  test("resize: batch payload rewrite with deterministic stub scaler") {
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
}
