package graft

import graft.ext.SimilarityOps
import graft.functions.{CosineSimilarity, GraftFunctions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def lit4(xs: Float*) = Literal.create(xs.toArray, ArrayType(FloatType))

  test("interpreted eval matches hand-computed cosine") {
    val e = CosineSimilarity(lit4(1f, 0f), lit4(1f, 0f))
    e.eval(null).asInstanceOf[Double] shouldBe 1.0 +- 1e-12
    val orth = CosineSimilarity(lit4(1f, 0f), lit4(0f, 1f))
    orth.eval(null).asInstanceOf[Double] shouldBe 0.0 +- 1e-12
    val mid = CosineSimilarity(lit4(1f, 1f), lit4(1f, 0f))
    mid.eval(null).asInstanceOf[Double] shouldBe (1.0 / math.sqrt(2)) +- 1e-12
  }

  test("null contract: null array, null element, length mismatch → null") {
    assert(CosineSimilarity(Literal.create(null, ArrayType(FloatType)), lit4(1f))
      .eval(null) == null)
    assert(CosineSimilarity(lit4(1f, 2f), lit4(1f)).eval(null) == null)
    val withNullElem = Literal.create(Array[java.lang.Float](1f, null),
      ArrayType(FloatType))
    assert(CosineSimilarity(withNullElem, lit4(1f, 2f)).eval(null) == null)
  }

  test("codegen path (via DataFrame) agrees exactly with the HOF form") {
    GraftFunctions.register(spark)
    val emb = sources.Stores.table(spark, sf0001, "embeddings").limit(200)
    val both = emb.select(
      SimilarityOps.cosineNative(col("embedding"), col("embedding")).as("native"),
      SimilarityOps.cosine(col("embedding"), col("embedding")).as("hof"))
    both.filter(col("native") =!= col("hof")).count() shouldBe 0L
  }

  test("registered via SQL name and usable in spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(cast(1 as float), cast(0 as float)), " +
        "array(cast(0.5 as float), cast(0 as float))) AS c").head()
    r.getDouble(0) shouldBe 1.0 +- 1e-12
  }

  test("Fingerprint60 equals the SQL md5-prefix composition, codegen and eval") {
    import graft.functions.Fingerprint60
    val docs = sources.Stores.table(spark, sf0001, "documents").limit(200)
    val both = docs.select(
      Fingerprint60(col("text")).as("native"),
      expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("sql"))
    both.filter(col("native") =!= col("sql")).count() shouldBe 0L
    // interpreted path (inside a higher-order lambda)
    val inLambda = docs.select(
      transform(split(col("text"), " "),
        t => graft.ext.TextOps.fingerprint60(t)).as("hs"),
      split(col("text"), " ").as("toks"))
    inLambda.selectExpr(
        "exists(zip_with(hs, transform(toks, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)), (a, b) -> a != b), x -> x) AS mismatch")
      .filter(col("mismatch")).count() shouldBe 0L
    // SQL registration
    graft.functions.GraftFunctions.register(spark)
    spark.sql("SELECT graft_fp60('hello') AS h").head().getLong(0) shouldBe
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
          .substring(0, 15), 16)
  }

  test("scoring join uses the native expression, not the interpreted lambda tree") {
    GraftFunctions.register(spark)
    val emb = sources.Stores.table(spark, sf0001, "embeddings")
    val plan = SimilarityOps.cosineTopK(emb.filter(col("vec_id") < 3), emb,
      "vec_id", "embedding", 2).queryExecution.executedPlan.toString
    plan should include("graft_cosine")
    // the HOF form would plan as aggregate(zip_with(...)) lambdas (CodegenFallback)
    plan should not include "zip_with"
    plan should not include "aggregate("
  }

  test("rrfFuse: shared ids sum reciprocal ranks across lists, ties break id-ascending") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val sem = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val out = SimilarityOps.rrfFuse(Seq(lex, sem), "id", "rank", kRrf = 60, k = 4)
      .as[(Long, Double, Long)].collect()
    // 10: 1/61 + 1/62; 20: 1/62 + 1/61 — EQUAL scores, id asc breaks the tie;
    // 30: 1/63; 40: 1/63 — equal again
    val both = BigDecimal(1.0 / 61).setScale(14, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(1.0 / 62).setScale(14, BigDecimal.RoundingMode.HALF_UP)
    val one3 = (1.0 / 63 * 1e6).round / 1e6
    out shouldBe Array(
      (10L, (both * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6, 2L),
      (20L, (both * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6, 2L),
      (30L, one3, 1L), (40L, one3, 1L))
  }

  test("randomProject: deterministic JL sign projection — linear, partition-invariant, norm-preserving in expectation") {
    import org.apache.spark.sql.functions._
    val vecs = (1 to 8).map { k =>
      (k.toLong, (0 until 64).map(i =>
        (math.sin(k * 64 + i) * 2).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.ext.SimilarityOps
      .randomProject(df, "vec_id", "embedding", dIn = 64, dOut = 8)
      .orderBy("vec_id", "j").as[(Long, Long, Double)].collect()
    out.length shouldBe 8 * 8
    // partition-invariance: the decimal fold is order-independent
    val again = graft.ext.SimilarityOps
      .randomProject(df.repartition(13), "vec_id", "embedding", 64, 8)
      .orderBy("vec_id", "j").as[(Long, Long, Double)].collect()
    again shouldBe out
    // linearity: proj(2v) = 2·proj(v) within the 6dp term rounding
    val doubled = vecs.map { case (id, v) => (id, v.map(_ * 2)) }
      .toDF("vec_id", "embedding")
    val out2 = graft.ext.SimilarityOps
      .randomProject(doubled, "vec_id", "embedding", 64, 8)
      .orderBy("vec_id", "j").as[(Long, Long, Double)].collect()
    out.zip(out2).foreach { case ((_, _, a), (_, _, b)) =>
      b shouldBe (2 * a) +- 1e-4
    }
    // E[||Pv||²] = ||v||² under the 1/√dOut scaling: the mean ratio over
    // 8 deterministic vectors sits well inside JL concentration bounds
    val norms = vecs.map { case (id, v) =>
      val p2 = out.filter(_._1 == id).map(r => r._3 * r._3).sum
      p2 / v.map(x => x.toDouble * x).sum
    }
    val meanRatio = norms.sum / norms.length
    meanRatio should (be > 0.5 and be < 2.0)
  }

  test("cosineNearDupPairsIncremental equals the self-join form restricted to batch x corpus") {
    import spark.implicits._
    val emb = graft.sources.Stores.table(spark, sf0001, "embeddings")
    val batch = emb.filter(col("vec_id") >= 100)
    val corpus = emb.filter(col("vec_id") < 100)
    for (t <- Seq(0.2, 0.35)) {
      // the self-join form over the union, restricted to (batch, corpus)
      // pairs in either orientation, re-keyed to (new_id, corpus_id)
      val full = graft.ext.SimilarityOps
        .cosineNearDupPairs(emb, "vec_id", "embedding", threshold = t)
        .filter((col("id1") >= 100 && col("id2") < 100) ||
          (col("id1") < 100 && col("id2") >= 100))
        .select(
          when(col("id1") >= 100, col("id1")).otherwise(col("id2")).as("new_id"),
          when(col("id1") < 100, col("id1")).otherwise(col("id2")).as("corpus_id"),
          col("score").as("cosine"))
        .orderBy("new_id", "corpus_id")
        .as[(Long, Long, Double)].collect()
      val incr = graft.ext.SimilarityOps
        .cosineNearDupPairsIncremental(batch, corpus, "vec_id", "embedding",
          threshold = t)
        .orderBy("new_id", "corpus_id")
        .as[(Long, Long, Double)].collect()
      withClue(s"threshold=$t: ") { incr shouldBe full }
      withClue(s"threshold=$t nonempty: ") { incr.length should be > 0 }
    }
  }
}
