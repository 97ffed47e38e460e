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
}
