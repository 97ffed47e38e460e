package graft

import java.nio.file.Files

import graft.ops.CoreOps
import graft.sources.Stores
import org.apache.spark.sql.functions._

/**
 * The PRODUCTION JDBC path, executed for real: every other JDBC spec
 * drives the jar-gate through injected seams (no server), which proves
 * the gate but never runs `format("jdbc")`. Apache Derby's embedded
 * engine ships on the Spark classpath (`derby*.jar` — Spark uses it for
 * the Hive metastore), so the full reference boundary can execute
 * in-process with zero network:
 *
 *   - staging batch APPEND (DAG:270-276 `execute_values` analog)
 *     through `Stores.writeJdbcOrParquet`'s default (non-injected) write;
 *   - read-back through `Stores.readJdbcOrParquet`'s default read;
 *   - keyed PARTIAL-UPDATE upsert (DAG:279-316 `ON CONFLICT ... DO
 *     UPDATE SET <subset>` analog) through [[Stores.jdbcUpsert]]'s
 *     staged-updates + server-side `MERGE INTO`, row-matched against the
 *     engine's own parquet-mart merge ([[CoreOps.upsert]]) on the same
 *     inputs.
 */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def freshDb(tag: String): String = {
    val home = Files.createTempDirectory(s"graft_derby_$tag").toString
    // derby.log and lock files land under the system home, not the repo
    System.setProperty("derby.system.home", home)
    s"jdbc:derby:$home/etl;create=true"
  }

  test("Derby embedded driver is present and gates into the jdbc branch") {
    Stores.jdbcDriverPresent(driver) shouldBe true
  }

  test("staging batch append + read-back through the real format(\"jdbc\") path") {
    val url = freshDb("staging")
    val staging = Stores.JdbcTarget(url, "staging", driver)
    val b1 = Seq((1L, "alpha", 10.5), (2L, "beta", 20.0)).toDF("id", "s", "v")
    val b2 = Seq((3L, "gamma", 30.25)).toDF("id", "s", "v")

    // two appends — the reference's per-run execute_values batches
    Stores.writeJdbcOrParquet(b1, staging, s"unused") shouldBe "jdbc"
    Stores.writeJdbcOrParquet(b2, staging, s"unused") shouldBe "jdbc"

    val back = Stores.readJdbcOrParquet(spark, staging, "unused")
    back.columns.toSeq shouldBe Seq("id", "s", "v")
    back.orderBy("id").as[(Long, String, Double)].collect() shouldBe
      Array((1L, "alpha", 10.5), (2L, "beta", 20.0), (3L, "gamma", 30.25))

    // the pushed-down filter goes to the server as a WHERE clause: the
    // read-side analog of the reference's server-side Mongo find()
    Stores.readJdbcOrParquet(spark, staging, "unused")
      .filter(col("id") >= 2L).count() shouldBe 2L
  }

  test("keyed partial-update upsert: server-side MERGE row-matches the parquet-mart merge") {
    val url = freshDb("mart")
    val mart = Stores.JdbcTarget(url, "mart", driver)
    val mart0 = Seq(
      (1L, "keep-s1", 1.0, "2024-01-01"),
      (2L, "old-s2", 2.0, "2024-01-02"),
      (3L, "keep-s3", 3.0, "2024-01-03")).toDF("id", "s", "v", "d")
    Stores.writeJdbcOrParquet(mart0, mart, "unused") shouldBe "jdbc"

    // conflicting keys 2 and 3 (partial update set {s, v}: d must KEEP its
    // target value on conflict), brand-new key 4, and a null-key row the
    // PK conflict target can never admit
    val updates = Seq(
      (Some(2L), "new-s2", 22.0, "2099-09-09"),
      (Some(3L), "new-s3", 33.0, "2099-09-09"),
      (Some(4L), "ins-s4", 4.0, "2024-01-04"),
      (None: Option[Long], "ghost", 0.0, "2099-09-09"))
      .toDF("id", "s", "v", "d")
    Stores.jdbcUpsert(updates, mart, key = "id", updateCols = Seq("s", "v"))

    val back = Stores.readJdbcOrParquet(spark, mart, "unused")
      .orderBy("id").as[(Long, String, Double, String)].collect()

    // the engine's own keyed partial-update merge on the same inputs is
    // the parity oracle — the parquet-mart path and the JDBC path must
    // answer identically
    val parquetPath = CoreOps.upsert(
        mart0, updates.filter(col("id").isNotNull), "id", Seq("s", "v"))
      .orderBy("id").as[(Long, String, Double, String)].collect()
    back shouldBe parquetPath
    back shouldBe Array(
      (1L, "keep-s1", 1.0, "2024-01-01"),
      (2L, "new-s2", 22.0, "2024-01-02"),   // updated subset, d kept
      (3L, "new-s3", 33.0, "2024-01-03"),   // updated subset, d kept
      (4L, "ins-s4", 4.0, "2024-01-04"))    // pure insert takes all cols

    // idempotent replay: the same MERGE lands on the same rows (the
    // retry-safety the reference leans on ON CONFLICT for) — replayed
    // under an explicit deterministic run id (the at-most-once-per-run
    // staging name a pipeline would use)
    Stores.jdbcUpsert(updates, mart, key = "id", updateCols = Seq("s", "v"),
      runId = "run_12_replay")
    Stores.readJdbcOrParquet(spark, mart, "unused")
      .orderBy("id").as[(Long, String, Double, String)].collect() shouldBe back

    // run-scoped staging is DROPPED after every merge — nothing lingers
    // for a concurrent upsert to clobber (Derby uppercases unquoted names)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSTABLES WHERE TABLENAME LIKE 'MART_UPDATES%'")
      rs.next()
      rs.getInt(1) shouldBe 0
    } finally conn.close()
  }

  test("jdbcUpsert refuses unsafe SQL identifiers before touching the db") {
    val updates = Seq((1L, "a")).toDF("id", "s")
    // table, key, column, and runId names are all interpolated into the
    // MERGE text, so each is validated against [A-Za-z][A-Za-z0-9_]*
    an[IllegalArgumentException] should be thrownBy Stores.jdbcUpsert(
      updates, Stores.JdbcTarget("jdbc:derby:memory:x", "mart; DROP TABLE m", driver),
      key = "id", updateCols = Seq("s"))
    an[IllegalArgumentException] should be thrownBy Stores.jdbcUpsert(
      updates.withColumnRenamed("s", "s\"bad"),
      Stores.JdbcTarget("jdbc:derby:memory:x", "mart", driver),
      key = "id", updateCols = Seq("s\"bad"))
    an[IllegalArgumentException] should be thrownBy Stores.jdbcUpsert(
      updates, Stores.JdbcTarget("jdbc:derby:memory:x", "mart", driver),
      key = "id", updateCols = Seq("s"), runId = "run-1; --")
  }

  test("absent-driver targets still fall back to parquet (gate unchanged)") {
    val work = Files.createTempDirectory("graft_jdbc_fb_").toString
    val df = Seq((1L, "a")).toDF("id", "s")
    val pg = Stores.JdbcTarget("jdbc:postgresql://db/x", "mart")
    Stores.writeJdbcOrParquet(df, pg, s"$work/fb") shouldBe "parquet"
    Stores.readJdbcOrParquet(spark, pg, s"$work/fb").count() shouldBe 1L
  }
}
