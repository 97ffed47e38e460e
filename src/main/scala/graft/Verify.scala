package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — trailing names restrict the
    // dump to those queries (local iteration; the driver passes none)
    val (Array(sfDir, outDir), onlyNames) = (args.take(2), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Plan-gate audit per query (graft.plans.PlanAudit — the SAME rule
    // set PlanAuditSpec enforces under `sbt test`): round 13 shipped a
    // query whose answer was oracle-green but whose plan violated the
    // gate, invisible to the driver's correctness pass. Recording the
    // violations beside the results makes the per-round artifact carry
    // plan health too, not just answers.
    val planViolations = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => onlyNames.isEmpty || onlyNames(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          planViolations ++= graft.plans.PlanAudit.violations(name, df)
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => onlyNames.isEmpty || onlyNames(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/plan_violations.json"),
      planViolations.map(q).mkString("[", ",", "]"))
    // artifact lifecycle beside the results: builds and build-lambda
    // seconds per memoized shared artifact (ArtifactRegistry). One Verify
    // sweep in one session must build each exactly once — a count > 1
    // here is the same red finding Bench's artifact_rebuilds flags.
    Files.writeString(Paths.get(s"$outDir/artifact_builds.json"),
      ArtifactRegistry.snapshot().toSeq.sortBy(_._1).map { case (k, (n, s)) =>
        s"${q(k)}: {\"builds\":$n,\"secs\":${BigDecimal(s)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP)}}"
      }.mkString("{", ",", "}"))
    if (planViolations.nonEmpty)
      System.err.println(
        s"[verify] ${planViolations.size} plan-gate violation(s): " +
          planViolations.mkString("; "))
    spark.stop()
  }
}
