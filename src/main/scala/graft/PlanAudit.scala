package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan auditor (not part of the driver contract): prints the
  * AQE-finalized executed plan of named SparkEntry queries so shuffle
  * count / broadcast / sort shape can be eyeballed per operator. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      val nSort = "Sort ".r.findAllIn(plan).length
      val nBc = "BroadcastHashJoin".r.findAllIn(plan).length
      val nWin = "Window".r.findAllIn(plan).length
      val nNLJ = "NestedLoop".r.findAllIn(plan).length
      println(s"== $name: exchanges=$nEx sorts=$nSort bcJoins=$nBc windows=$nWin nestedLoop=$nNLJ")
      if (sys.env.contains("PLAN_FULL")) println(plan)
    }
    spark.stop()
  }
}
