package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query execution profile: number of Spark jobs, stages, tasks and
  * per-job wall ms a query triggers, plus construction (plan-build) time —
  * the measurement harness behind the optimization round's "where does a
  * 0.5 s query spend its time" question (guide §1: measure first; at sf0.1
  * in local mode most of the tail cost is job/stage count, not bytes).
  *
  * Usage: `runMain graft.QueryProfile <sfDir> <passes> <query> [query ...]`
  * Reports, for each query, the LAST pass (warm JIT/codegen): jobs, stages,
  * tasks, per-job ms, build ms (fn invocation = plan construction incl. any
  * eager probe jobs), drain ms.
  */
object QueryProfile {
  private def drain(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreachPartition { it =>
      while (it.hasNext) it.next()
    }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count()
    SparkEntry.queries.get("q_projection")
      .foreach(fn => try drain(fn(spark, dir)) catch { case _: Throwable => })

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobMs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time, Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(j.jobId)
        if (st != null) jobMs.add((j.jobId, j.time - st._1, st._2))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"no such query: $name")
        case Some(fn) =>
          var report = ""
          (1 to passes).foreach { pass =>
            jobMs.clear(); stages.set(0); tasks.set(0)
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            val t1 = System.nanoTime()
            try drain(df) catch { case e: Throwable =>
              System.err.println(s"$name FAILED: $e")
            }
            val t2 = System.nanoTime()
            // listener bus is async; give it a beat to flush
            Thread.sleep(300)
            import scala.jdk.CollectionConverters._
            val jl = jobMs.asScala.toSeq.sortBy(_._1)
            report =
              f"$name%-28s pass=$pass total=${(t2 - t0) / 1e6}%8.1f ms " +
              f"build=${(t1 - t0) / 1e6}%8.1f ms drain=${(t2 - t1) / 1e6}%8.1f ms " +
              f"jobs=${jl.size}%3d stages=${stages.get}%3d tasks=${tasks.get}%4d\n" +
              jl.map { case (id, ms, desc) =>
                f"    job#$id%-4d ${ms}%6d ms  ${desc.take(70)}"
              }.mkString("\n")
            println(report)
          }
      }
    }
    spark.stop()
  }
}
