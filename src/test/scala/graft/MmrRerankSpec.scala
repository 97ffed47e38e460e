package graft

import org.apache.spark.sql.functions._

import graft.ext.SimilarityOps

/** MMR diversity re-ranking: reduction to plain top-k at λ=1, the
  * planted-duplicate demotion that is its purpose, and pick sanity. */
class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  // query 1 points at x; 10 is the best hit, 11 its near-duplicate,
  // 12 a moderately relevant but DIFFERENT direction
  private def corpus = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (10L, Array(0.99f, 0.1f, 0f, 0f)),
    (11L, Array(0.989f, 0.11f, 0f, 0f)),
    (12L, Array(0.7f, 0f, 0.7f, 0f)),
    (13L, Array(0.1f, 0f, 0f, 1f))).toDF("vec_id", "embedding")

  test("λ=1 reduces to plain relevance order") {
    val queries = corpus.filter(col("vec_id") === 1)
    val mmr = SimilarityOps.mmrRerank(queries, corpus, "vec_id",
        "embedding", pool = 4, k = 3, lambda = 1.0)
      .orderBy("pick").as[(Long, Long, Double, Double, Int)].collect()
    val plain = SimilarityOps.cosineTopK(queries, corpus, "vec_id",
        "embedding", 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    mmr.map(_._2) shouldBe plain
    // with λ=1 the redundancy term is weightless: mmr = λ·rel = rel
    mmr.foreach { case (_, _, rel, m, pick) =>
      if (pick > 1) m shouldBe rel else m shouldBe rel
    }
  }

  test("the near-duplicate of pick 1 is demoted below the diverse hit") {
    val queries = corpus.filter(col("vec_id") === 1)
    val got = SimilarityOps.mmrRerank(queries, corpus, "vec_id",
        "embedding", pool = 4, k = 3, lambda = 0.5)
      .orderBy("pick").as[(Long, Long, Double, Double, Int)].collect()
    // plain relevance picks (10, 11, 12): 11 is the dup twin. MMR pays
    // the twin's ~1.0 similarity twice — pick 2 takes the diverse 12,
    // and pick 3 takes the weak-but-NOVEL 13 over the redundant twin:
    // the dup never makes the context at all
    got.map(_._2) shouldBe Array(10L, 12L, 13L)
  }

  test("geometricMedian resists the outlier that drags the mean") {
    // 30 points near (1,1) plus one at (1000, 1000): the mean lands
    // ~(33, 33); the geometric median stays inside the cluster
    val rows = (1 to 30).map(i =>
      (0L, Array(1.0f + (i % 3) * 0.01f, 1.0f - (i % 5) * 0.01f))) :+
      (0L, Array(1000f, 1000f))
    val m = SimilarityOps.geometricMedian(rows.toDF("label", "embedding"),
      "label", "embedding", dims = 2, rounds = 5).head()
    val (m1, m2) = (m.getAs[Double]("m1"), m.getAs[Double]("m2"))
    m1 should be < 1.1
    m1 should be > 0.9
    m2 should be < 1.1
    m2 should be > 0.9
    // the mean, for contrast, is dragged past 30
    val mean = rows.map(_._2(0).toDouble).sum / rows.length
    mean should be > 30.0
  }

  test("geometricMedian of identical points is that point, immediately") {
    val rows = Seq.fill(7)((1L, Array(2.5f, -3.25f)))
    val m = SimilarityOps.geometricMedian(rows.toDF("label", "embedding"),
      "label", "embedding", dims = 2, rounds = 3).head()
    m.getAs[Double]("m1") shouldBe 2.5
    m.getAs[Double]("m2") shouldBe -3.25
  }

  test("picks are distinct, pool-bounded, and numbered 1..k") {
    val queries = corpus.filter(col("vec_id") <= 10)
    val got = SimilarityOps.mmrRerank(queries, corpus, "vec_id",
        "embedding", pool = 4, k = 4, lambda = 0.7)
      .as[(Long, Long, Double, Double, Int)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).distinct.length shouldBe rows.length
      rows.map(_._5).sorted shouldBe (1 to rows.length).toArray
    }
  }
}
