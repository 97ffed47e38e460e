package graft

import graft.ops.StatsOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec

/**
 * The distributed order-statistics kernel (StatsOps.distributedCumSum /
 * distributedRowNumber / distributedNtile(s)) — the round-13 fix for the
 * q_spearman class of scale bug (a corpus-sized support funneled through
 * an unpartitioned rank window = one sort task at 100 TB):
 *
 *  1. VALUE equivalence: the kernel is row-identical to the naive
 *     single-window form on tie-heavy and wide random frames (boundary
 *     sampling and bucket layout affect BALANCE only, never a value);
 *  2. PLAN shape: on a support ~as wide as the corpus, every
 *     unpartitioned Window in the executed plan rides the bounded
 *     bucket GRID (≤ B rows by construction), never the support itself
 *     — asserted by walking the physical plan.
 */
class DistributedRankSpec extends SparkSpec {

  import spark.implicits._

  private def naiveCumSum(df: org.apache.spark.sql.DataFrame,
                          includeCurrent: Boolean) = {
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding,
        if (includeCurrent) Window.currentRow else -1)
    df.withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
  }

  test("distributedCumSum matches the single-window cumulative sum (both frames)") {
    // distinct support values (the caller contract), tie-free
    val rows = (1 to 500).map(i => ((i * 37 % 997).toLong, (i % 7 + 1).toLong))
      .distinctBy(_._1)
    val df = rows.toDF("v", "c")
    for (inc <- Seq(true, false)) {
      val got = StatsOps.distributedCumSum(df, "v", col("c"), "cum",
          includeCurrent = inc)
        .select("v", "cum").as[(Long, Long)].collect().sortBy(_._1)
      val want = naiveCumSum(df, inc)
        .select("v", "cum").as[(Long, Long)].collect().sortBy(_._1)
      withClue(s"includeCurrent=$inc: ") { got shouldBe want }
    }
  }

  test("distributedRowNumber matches row_number over the same total order, asc and desc") {
    val rows = (1 to 400).map(i => ((i * 13 % 31).toLong, i.toLong))
    val df = rows.toDF("k", "id")
    for (desc <- Seq(false, true)) {
      val ord = Seq(if (desc) col("k").desc else col("k").asc, col("id").asc)
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1)
      val got = StatsOps.distributedRowNumber(df, "k", desc, Seq("id"), "rn")
        .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1)
      withClue(s"desc=$desc: ") { got shouldBe want }
    }
  }

  test("distributedNtile matches SQL NTILE exactly, including the remainder tiles and n < tiles") {
    for ((rows, tiles) <- Seq((403, 5), (17, 4), (3, 5), (1, 7))) {
      val df = (1 to rows).map(i => ((i * 29 % 53).toLong, i.toLong))
        .toDF("k", "id")
      val want = df.withColumn("t", ntile(tiles).over(
          Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
        .select("id", "t").as[(Long, Long)].collect().sortBy(_._1)
      val got = StatsOps.distributedNtile(df, tiles, "k",
          desc = false, "id", "t")
        .select("id", "t").as[(Long, Long)].collect().sortBy(_._1)
      withClue(s"rows=$rows tiles=$tiles: ") { got shouldBe want }
    }
  }

  test("distributedNtiles ranks several orderings in one pass, each NTILE-exact") {
    val df = (1 to 250).map(i =>
      (i.toLong, (i * 7 % 40).toLong, (i * 11 % 23).toDouble)).toDF("id", "a", "b")
    val want = df.select(col("id"),
        ntile(4).over(Window.orderBy(col("a").desc, col("id").asc))
          .cast("long").as("ta"),
        ntile(4).over(Window.orderBy(col("b").asc, col("id").asc))
          .cast("long").as("tb"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val got = StatsOps.distributedNtiles(df, 4, Seq(
        ("a", true, "id", "ta"), ("b", false, "id", "tb")))
      .select("id", "ta", "tb").as[(Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe want
  }

  test("wide support: spearman's executed plan keeps every unpartitioned window on the bucket grid") {
    // support cardinality ~ corpus cardinality — exactly the shape that
    // was a single-task sort before round 13
    val wide = (1 to 30000).map(i =>
      (i.toDouble + 1.0 / (i % 9 + 2), (i * 37 % 30011).toDouble))
      .toDF("x", "y")
    val q = StatsOps.spearmanCorr(wide, "x", "y")
    val rho = q.head().getAs[java.lang.Double]("rho")
    rho should not be null
    // value check against the naive doubled-rank form
    def naiveRanks(c: String) = {
      val w = Window.orderBy(col(c).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      wide.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .withColumn("__r2",
          coalesce(sum(col("__c")).over(w), lit(0L)) * 2 + col("__c") + 1)
        .select(col(c), col("__r2"))
    }
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val naive = wide.join(naiveRanks("x").withColumnRenamed("__r2", "rx"), "x")
      .join(naiveRanks("y").withColumnRenamed("__r2", "ry"), "y")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("rx").cast(dec)).as("sx"), sum(col("ry").cast(dec)).as("sy"),
        sum(col("rx").cast(dec) * col("rx").cast(dec)).as("sxx"),
        sum(col("ry").cast(dec) * col("ry").cast(dec)).as("syy"),
        sum(col("rx").cast(dec) * col("ry").cast(dec)).as("sxy"))
      .select(round((col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 8)
        .as("rho")).head().getDouble(0)
    rho.doubleValue() shouldBe naive
    // plan shape: the only unpartitioned windows ride the ≤B bucket grid
    // (their input is the groupBy(__bkt) aggregate), and the support's
    // own cumulative window is partitioned by __bkt
    val plan = q.queryExecution.sparkPlan
    val wins = plan.collect { case w: WindowExec => w }
    wins should not be empty
    val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
    unpart should not be empty
    part should not be empty
    unpart.foreach { w =>
      val aggBelow = w.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains("__bkt")) => a
      }
      withClue(s"unpartitioned window not over the bucket grid:\n$w\n") {
        aggBelow should not be empty
      }
    }
    part.foreach { w =>
      withClue(s"partitioned rank window must partition by __bkt:\n$w\n") {
        w.partitionSpec.exists(_.toString.contains("__bkt")) shouldBe true
      }
    }
  }
}
