package graft

import graft.ext.SimilarityOps
import graft.sources.Stores
import org.apache.spark.sql.functions._

class KmeansIvfSpec extends SparkSpec {

  private lazy val emb = Stores.table(spark, sf0001, "embeddings")

  test("kmeansCentroids: deterministic, keeps c centroids of full dimension") {
    val c1 = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding",
      c = 4, iters = 3, dim = 64)
    val c2 = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding",
      c = 4, iters = 3, dim = 64)
    c1.map(_._1) shouldBe Seq(0L, 1L, 2L, 3L)
    all(c1.map(_._2.length)) shouldBe 64
    c1 shouldBe c2
    // training moved the centroids off their seed vectors
    val seeds = SimilarityOps.takeCentroids(emb, "vec_id", "embedding", 4)
    c1 should not be seeds
  }

  test("every corpus vector is assigned to an existing trained cell") {
    val cents = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding",
      c = 4, iters = 2, dim = 64)
    val cells = SimilarityOps.ivfAssign(emb, cents, "vec_id", "embedding")
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    cells.subsetOf(cents.map(_._1).toSet) shouldBe true
    SimilarityOps.ivfAssign(emb, cents, "vec_id", "embedding")
      .filter(col("cell").isNull).count() shouldBe 0L
  }

  test("ivfTopK with trained centroids returns ranked neighbors per query") {
    val cents = SimilarityOps.kmeansCentroids(emb, "vec_id", "embedding",
      c = 4, iters = 2, dim = 64)
    val out = SimilarityOps.ivfTopK(emb.filter(col("vec_id") < 5), emb,
      cents, "vec_id", "embedding", k = 3).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.length should be <= 3
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      byRank.map(_.getAs[Double]("score")).toSeq shouldBe
        byRank.map(_.getAs[Double]("score")).sorted(Ordering[Double].reverse).toSeq
    }
  }
}
