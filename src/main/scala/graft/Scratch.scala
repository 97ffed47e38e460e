package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc perf scratchpad (not part of the driver contract): warm-times
  * named SparkEntry queries at sf0.1 and prints their formatted plans. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.isEmpty) Seq("q_minby_maxby") else args.toSeq
    // drain, not count: count() lets Catalyst prune every column, so a
    // projection-heavy query measures ~nothing (the Bench.drain discipline)
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) it.next()
      }
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) { println(s"==== $name plan:"); fn(spark, d).explain("formatted") }
      val warm = fn(spark, d)
      drain(warm) // warm
      // post-execution: AQE's FINAL plan, where runtime stage reuse shows
      if (explain) println(s"==== $name executed:\n" +
        warm.queryExecution.executedPlan.toString.take(8000))
      val t0 = System.nanoTime()
      drain(fn(spark, d))
      println(s"== $name: ${(System.nanoTime() - t0) / 1e9}s")
    }
    // artifact build costs paid during the run (warm pass included) —
    // the same per-key numbers Bench emits, for ad-hoc profiling
    ArtifactRegistry.snapshot().toSeq.sortBy(-_._2._2).foreach {
      case (k, (n, secs)) => println(f"== artifact $k: $n%d builds, $secs%.2f s")
    }
    spark.stop()
  }
}
