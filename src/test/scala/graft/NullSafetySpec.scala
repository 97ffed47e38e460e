package graft

import graft.ext.{DedupOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Null/empty-input robustness: 100 TB corpora always contain empty and
  * null documents; no operator may throw or mis-count on them. */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "normal document with several words"),
    (2L, ""),
    (3L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  test("shingleHashes: null text → null array (row dropped on explode)") {
    val out = docs.select(col("doc_id"),
      DedupOps.shingleHashes(col("text"), 3).as("sh"))
    out.filter(col("doc_id") === 3).head().isNullAt(1) shouldBe true
    // empty string still yields exactly one shingle (the empty gram)
    out.filter(col("doc_id") === 2).head().getSeq[Long](1).length shouldBe 1
  }

  test("minhash and jaccard pipelines survive null/empty docs") {
    noException should be thrownBy
      DedupOps.minhashDedupPairs(docs, "doc_id", "text", 3, 16, 4, 0.9).collect()
    noException should be thrownBy
      DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.9).collect()
    // the two degenerate docs must not pair with the normal one
    DedupOps.minhashDedupPairs(docs, "doc_id", "text", 3, 16, 4, 0.1)
      .filter(col("id1") === 1 || col("id2") === 1).count() shouldBe 0L
  }

  test("simhash drops null docs, keeps empty ones deterministically") {
    val sigs = DedupOps.simhashSignatures(docs, "doc_id", "text", 16)
    sigs.count() shouldBe 2       // null filtered, empty kept
    sigs.filter(col("id") === 3).count() shouldBe 0L
  }

  test("langIdHeuristic and qualityFeatures: null-safe, empty-safe") {
    val out = docs.select(col("doc_id"),
      TextOps.langIdHeuristic(col("text")).as("lang"))
    out.filter(col("doc_id") === 2).head().getString(1) shouldBe "unknown"
    out.filter(col("doc_id") === 3).head().getString(1) shouldBe "unknown"
    noException should be thrownBy
      TextOps.qualityFeatures(docs, "text").collect()
  }

  test("winnowFingerprints: short/null docs produce zero fingerprints") {
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
    fp.filter(col("doc_id") === 2).count() shouldBe 0L  // shorter than k
    fp.filter(col("doc_id") === 3).count() shouldBe 0L  // null
    fp.filter(col("doc_id") === 1).count() should be > 0L
  }

  test("cosine over null embedding is null, not an error") {
    val vecs = Seq(
      (1L, Some(Seq(1.0f, 0.0f))),
      (2L, None)).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val out = vecs.select(SimilarityOps.cosine(col("v"), col("v")).as("c"))
      .orderBy(lit(1)).collect()
    noException should be thrownBy out
    out.count(_.isNullAt(0)) shouldBe 1
  }
}
