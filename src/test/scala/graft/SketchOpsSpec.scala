package graft

import graft.ops.SketchOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int): DataFrame =
    spark.range(0, n).select(col("id").as("k"),
      (col("id") % 7).cast("string").as("g"),
      (col("id") * 37 % 10007).cast("double").as("v"))

  private def pairsOf(df: DataFrame): Map[String, (Long, Seq[(Long, Double)])] =
    df.select(col("g"), col(SketchOps.NCol), col(SketchOps.PairsCol))
      .as[(String, Long, Seq[(Long, Double)])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("sketch is bit-deterministic under any partitioning") {
    val a = pairsOf(SketchOps.sketch(mk(5000).repartition(3), "k", "v",
      Seq("g"), k = 64))
    val b = pairsOf(SketchOps.sketch(mk(5000).repartition(17), "k", "v",
      Seq("g"), k = 64))
    a shouldBe b
    a.values.foreach { case (n, pairs) =>
      n shouldBe (5000L / 7 +- 1L)
      pairs.length shouldBe 64
      pairs.map(_._1) shouldBe pairs.map(_._1).sorted // hash asc
    }
  }

  test("merge of disjoint-slice sketches is BIT-IDENTICAL to the direct sketch") {
    val df = mk(6000).withColumn("slice", col("k") % 5)
    val sliced = SketchOps.sketch(df, "k", "v", Seq("g", "slice"), k = 128)
    val merged = pairsOf(SketchOps.mergeSketches(sliced, Seq("g"), k = 128))
    val direct = pairsOf(SketchOps.sketch(df, "k", "v", Seq("g"), k = 128))
    merged shouldBe direct
  }

  test("rank error of estimates stays within the sampling bound") {
    // single group, known uniform-ish distribution, k=512 → bound 0.07 is
    // ~5 sigma; the check is deterministic (fixed data, fixed hash)
    val df = mk(20000).withColumn("g", lit("all"))
    val sk = SketchOps.sketch(df, "k", "v", Seq("g"), k = 512)
    val est = Seq(0.1, 0.5, 0.9, 0.99).map(p => sk.select(col("g"),
        lit(p).as("p"), SketchOps.sketchQuantile(col("sk_pairs"), p).as("est")))
      .reduce(_ unionByName _)
    val audit = SketchOps.rankErrorAudit(df, "v", Seq("g"), est, eps = 0.07)
      .select("p", "est_rank", "within_eps")
      .as[(Double, Double, Boolean)].collect().sortBy(_._1)
    audit.length shouldBe 4
    all(audit.map(_._3)) shouldBe true
    // and estimates actually track p, not just sit inside a loose band
    audit.map(_._2) shouldBe sorted
  }

  test("k >= group size: the sample IS the group and quantiles are exact order statistics") {
    val df = mk(300).withColumn("g", lit("all"))
    val sk = SketchOps.sketch(df, "k", "v", Seq("g"), k = 512)
    val (n, pairs) = pairsOf(sk)("all")
    n shouldBe 300L
    pairs.length shouldBe 300
    val vals = df.select("v").as[Double].collect().sorted
    for (p <- Seq(0.0, 0.1, 0.5, 0.9, 1.0)) {
      val est = sk.select(SketchOps.sketchQuantile(col(SketchOps.PairsCol), p))
        .head().getDouble(0)
      est shouldBe vals(math.max(1, math.ceil(p * 300).toInt) - 1)
    }
  }

  test("persisted sketches survive parquet and APPEND like any additive artifact") {
    val work = java.nio.file.Files.createTempDirectory("graft_sk_").toString
    val df = mk(4000).withColumn("day", col("k") % 3)
    // day 0+1 persisted earlier; day 2 arrives later and is appended
    SketchOps.sketch(df.filter(col("day") < 2), "k", "v", Seq("g", "day"),
      k = 64).write.parquet(s"$work/sk")
    SketchOps.sketch(df.filter(col("day") === 2), "k", "v", Seq("g", "day"),
      k = 64).write.mode("append").parquet(s"$work/sk")
    val merged = pairsOf(SketchOps.mergeSketches(
      spark.read.parquet(s"$work/sk"), Seq("g"), k = 64))
    val direct = pairsOf(SketchOps.sketch(df, "k", "v", Seq("g"), k = 64))
    merged shouldBe direct
  }

  private def kmvOf(df: DataFrame): Map[String, Seq[Long]] =
    df.select(col("g"), col(SketchOps.KmvCol))
      .as[(String, Seq[Long])].collect().toMap

  test("setSketch: partition-invariant, duplicates collapse, sorted") {
    // every key appears 3× IN ITS GROUP (g derives from the folded key)
    // — the sketch must equal the distinct-input one
    val dup = mk(3000).select((col("k") % 1000).as("k"))
      .withColumn("g", (col("k") % 7).cast("string"))
    val a = kmvOf(SketchOps.setSketch(dup.repartition(3), "k", Seq("g"), 64))
    val b = kmvOf(SketchOps.setSketch(dup.repartition(13), "k", Seq("g"), 64))
    val d = kmvOf(SketchOps.setSketch(dup.distinct(), "k", Seq("g"), 64))
    a shouldBe b
    a shouldBe d
    a.values.foreach { h =>
      h shouldBe h.sorted
      h.distinct.length shouldBe h.length
    }
  }

  test("mergeSetSketches over OVERLAPPING slices equals the direct sketch") {
    // slices share members (the folded key repeats across days, g derives
    // from the key so repeats stay in-group) — the KMV merge must still
    // equal the direct set sketch bit-identically
    val df = mk(3000).select((col("k") % 500).as("k"),
      (col("k") % 3).as("day"))
      .withColumn("g", (col("k") % 7).cast("string"))
    val daily = SketchOps.setSketch(df, "k", Seq("g", "day"), k = 64)
    val merged = kmvOf(SketchOps.mergeSetSketches(daily, Seq("g"), k = 64))
    val direct = kmvOf(SketchOps.setSketch(df, "k", Seq("g"), k = 64))
    merged shouldBe direct
  }

  test("kmvDistinct: exact below k, within 3/sqrt(k) relative error above") {
    val k = 256
    val small = spark.range(0, 100).select(col("id").as("k"), lit("a").as("g"))
    val est0 = SketchOps.setSketch(small, "k", Seq("g"), k)
      .select(SketchOps.kmvDistinct(col(SketchOps.KmvCol), k))
      .head().getDouble(0)
    est0 shouldBe 100.0
    val big = spark.range(0, 50000).select(col("id").as("k"), lit("a").as("g"))
    val est = SketchOps.setSketch(big, "k", Seq("g"), k)
      .select(SketchOps.kmvDistinct(col(SketchOps.KmvCol), k))
      .head().getDouble(0)
    math.abs(est - 50000.0) / 50000.0 should be < 3.0 / math.sqrt(k)
  }

  test("kmvJaccard: 1 on identical sets, 0 on disjoint, accurate between") {
    val k = 256
    def sk(lo: Long, hi: Long) =
      SketchOps.setSketch(
        spark.range(lo, hi).select(col("id").as("k"), lit("a").as("g")),
        "k", Seq("g"), k)
        .select(col(SketchOps.KmvCol)).head().getSeq[Long](0)
    val a = sk(0, 10000)
    val b = sk(5000, 15000) // true J = 5000/15000 = 1/3
    val c = sk(20000, 30000)
    def j(x: Seq[Long], y: Seq[Long]): Double =
      spark.range(1).select(SketchOps.kmvJaccard(
        typedlit(x), typedlit(y), k)).head().getDouble(0)
    j(a, a) shouldBe 1.0
    j(a, c) shouldBe 0.0
    math.abs(j(a, b) - 1.0 / 3) should be < 4 * math.sqrt(1.0 / 3 * 2 / 3 / k)
  }
}
