package graft

import graft.sources.DocsScan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/**
 * The custom DataSource V2 seam, proven end-to-end: `format("graft-docs")`
 * resolves through the ServiceLoader registration (a deployment adds no
 * code), Catalyst pushes filters INTO the custom scan via
 * `SupportsPushDownFilters` (no post-scan Filter node remains when the
 * predicate is fully supported) and prunes columns via
 * `SupportsPushDownRequiredColumns` — the engine-side executable analog of
 * the reference's server-side `collection.find(query, projection)`
 * (DAG:94-132).
 */
class DocsConnectorSpec extends SparkSpec {
  import spark.implicits._

  private val ddl =
    "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"

  /** documents (sans text) exported once as JSON-lines — the document
    * store the connector fronts. */
  private lazy val dir: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_src_").toString + "/docs"
    graft.sources.Stores.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "source", "n_chars")
      .coalesce(2).write.json(p)
    p
  }

  private def docs: DataFrame = spark.read.format("graft-docs")
    .option("path", dir).option("schema", ddl).load()

  private def native: DataFrame = {
    import org.apache.spark.sql.types.StructType
    spark.read.schema(StructType.fromDDL(ddl)).json(dir)
  }

  private def docsScanOf(df: DataFrame): DocsScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    scans should have size 1
    scans.head shouldBe a[DocsScan]
    scans.head.asInstanceOf[DocsScan]
  }

  private def filterNodes(df: DataFrame): Seq[FilterExec] =
    df.queryExecution.executedPlan.collect { case f: FilterExec => f }

  test("format(\"graft-docs\") resolves by short name and round-trips the corpus") {
    docs.count() shouldBe native.count()
    docs.orderBy("doc_id").as[(Long, String, String, Long)].collect() shouldBe
      native.orderBy("doc_id").as[(Long, String, String, Long)].collect()
  }

  test("supported predicates are FULLY pushed into the custom scan — no post-scan Filter") {
    val q = docs
      .filter(col("doc_id") >= 100L && col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    // the filter reached the scan, not a FilterExec above it
    withClue(s"plan:\n${q.queryExecution.executedPlan}\n") {
      filterNodes(q) shouldBe empty
    }
    val scan = docsScanOf(q)
    scan.description() should include("GreaterThanOrEqual(doc_id,100)")
    scan.description() should include("EqualTo(lang,en)")
    // and the result matches the native reader on the same predicate
    val expect = native.filter(col("doc_id") >= 100L && col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    expect.length should be > 0
    q.orderBy("doc_id").as[(Long, Long)].collect() shouldBe expect
  }

  test("column pruning reaches the scan: ReadSchema carries ONLY selected columns") {
    val q = docs.filter(col("n_chars") >= 50L).select(col("doc_id"))
    val scan = docsScanOf(q)
    // doc_id selected; n_chars only FILTERED on (pushed) — pruned from read
    scan.readSchema().fieldNames.toSeq shouldBe Seq("doc_id")
    q.count() shouldBe native.filter(col("n_chars") >= 50L).count()
  }

  test("unsupported predicates come back as residuals — Spark filters post-scan, result still exact") {
    val q = docs.filter(col("lang").endsWith("n")) // StringEndsWith: not pushed
    withClue(s"plan:\n${q.queryExecution.executedPlan}\n") {
      filterNodes(q) should not be empty
    }
    docsScanOf(q).description() should not include "EndsWith"
    q.orderBy("doc_id").as[(Long, String, String, Long)].collect() shouldBe
      native.filter(col("lang").endsWith("n"))
        .orderBy("doc_id").as[(Long, String, String, Long)].collect()
  }

  test("null / missing fields and In / StartsWith semantics at the scan") {
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_nulls_").resolve("d.jsonl")
    java.nio.file.Files.write(p, java.util.Arrays.asList(
      """{"doc_id": 1, "lang": "en", "source": "web", "n_chars": 10}""",
      """{"doc_id": 2, "lang": null, "source": "webinar", "n_chars": 20}""",
      """{"doc_id": 3, "source": "print", "n_chars": 30}""", // lang absent
      """{"doc_id": 4, "lang": "de", "source": "web", "n_chars": null}"""))
    def d = spark.read.format("graft-docs")
      .option("path", p.toString).option("schema", ddl).load()

    // IsNull keeps null AND absent; comparisons on null drop the row
    d.filter(col("lang").isNull).select("doc_id")
      .as[Long].collect().sorted shouldBe Array(2L, 3L)
    d.filter(col("n_chars") > 5L).count() shouldBe 3L // null n_chars drops
    d.filter(col("lang").isin("en", "de")).select("doc_id")
      .as[Long].collect().sorted shouldBe Array(1L, 4L)
    val sw = d.filter(col("source").startsWith("web"))
    filterNodes(sw) shouldBe empty // StartsWith is pushed
    sw.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 4L)
  }

  test("limit pushdown: the scan stops shipping rows (find().limit analog)") {
    val q = docs.filter(col("n_chars") >= 50L).limit(7)
    docsScanOf(q).description() should include("PushedLimit: 7")
    q.count() shouldBe 7L
    // a limit wider than the matching set changes nothing — exactness
    // never depends on the pushed hint
    val q2 = docs.filter(col("doc_id") < 5L).limit(100)
    docsScanOf(q2).description() should include("PushedLimit: 100")
    q2.orderBy("doc_id").as[(Long, String, String, Long)].collect() shouldBe
      native.filter(col("doc_id") < 5L)
        .orderBy("doc_id").as[(Long, String, String, Long)].collect()
  }

  test("statistics seam: the scan reports its on-disk size to the optimizer") {
    // SupportsReportStatistics — what lets Catalyst choose broadcast
    // joins against the connector; size = listed file bytes (an upper
    // bound under pushdown: overestimates never broadcast something big)
    val fileBytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".") && !f.getName.endsWith(".crc"))
      .map(_.length).sum
    fileBytes should be > 0L
    val stats = docsScanOf(docs.filter(col("doc_id") >= 0L))
      .estimateStatistics()
    stats.sizeInBytes().getAsLong shouldBe fileBytes
    stats.numRows().isPresent shouldBe false
    // and Catalyst actually CONSUMES it: the optimized scan relation's
    // plan statistics carry the connector's size (this is the number
    // join strategy choices read), not the +inf default of an opaque
    // source
    docs.queryExecution.optimizedPlan.stats.sizeInBytes shouldBe
      BigInt(fileBytes)
  }

  test("write path: append + truncate-overwrite through the two-phase commit") {
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_write_").toString + "/table"
    def table = spark.read.format("graft-docs")
      .option("path", p).option("schema", ddl).load()
    def rows = table.orderBy("doc_id")
      .as[(Long, String, String, Long)].collect()

    val a = Seq((1L, "en", "web", 10L), (2L, "de", "print", 20L))
      .toDF("doc_id", "lang", "source", "n_chars")
    a.repartition(2).write.format("graft-docs")
      .option("path", p).mode("append").save()
    rows shouldBe Array((1L, "en", "web", 10L), (2L, "de", "print", 20L))

    // append accretes
    Seq((3L, "fr", "web", 30L)).toDF("doc_id", "lang", "source", "n_chars")
      .write.format("graft-docs").option("path", p).mode("append").save()
    rows.map(_._1) shouldBe Array(1L, 2L, 3L)

    // overwrite truncates THEN promotes (never an empty window for a
    // failed overwrite: staged files are verified before the truncate)
    Seq((9L, "zh", "print", 90L), (8L, "en", "web", 80L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .write.format("graft-docs").option("path", p).mode("overwrite").save()
    rows shouldBe Array((8L, "en", "web", 80L), (9L, "zh", "print", 90L))

    // nulls round-trip; the native JSON reader agrees with the connector
    Seq((10L, None: Option[String], "web", None: Option[Long]))
      .toDF("doc_id", "lang", "source", "n_chars")
      .write.format("graft-docs").option("path", p).mode("append").save()
    table.filter(col("doc_id") === 10L).head().isNullAt(1) shouldBe true
    import org.apache.spark.sql.types.StructType
    spark.read.schema(StructType.fromDDL(ddl)).json(p)
      .orderBy("doc_id").as[(Long, Option[String], String, Option[Long])]
      .collect() shouldBe
      table.orderBy("doc_id")
        .as[(Long, Option[String], String, Option[Long])].collect()

    // the commit cleaned its staging; nothing non-data is left behind
    new java.io.File(p).listFiles().map(_.getName)
      .count(n => n.startsWith("_") || n.startsWith(".")) shouldBe 0
  }

  test("write path refuses schemas the store cannot hold") {
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_badw_").toString + "/t"
    val bad = Seq((1L, Seq(1, 2))).toDF("doc_id", "arr")
    val e = intercept[Exception] {
      bad.write.format("graft-docs").option("path", p).mode("append").save()
    }
    e.getMessage should include("BIGINT/INT/DOUBLE/STRING/BOOLEAN")
  }

  test("schema-pinned: a schemaless read refuses loudly") {
    val e = intercept[Exception] {
      spark.read.format("graft-docs").option("path", dir).load()
    }
    e.getMessage should include("schema-pinned")
  }

  test("stray non-data files in the store directory are skipped, not parsed") {
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_stray_").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "lang")
      .write.format("graft-docs").option("path", p).mode("append").save()
    // a foreign file that is NOT part-*/[.]json[l] must not break the scan
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$p/README.txt"),
      "not json at all".getBytes("UTF-8"))
    spark.read.format("graft-docs").option("path", p)
      .option("schema", "doc_id BIGINT, lang STRING").load()
      .orderBy("doc_id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b"))
  }

  test("append commits from different writers never silently replace a data file") {
    // promoted names carry the queryId tag — two appends land side by
    // side (the taskId-only name was unique within ONE application and
    // silently overwrote across applications)
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_uniq_").toString + "/t"
    Seq((1L, "a")).toDF("doc_id", "lang")
      .write.format("graft-docs").option("path", p).mode("append").save()
    Seq((2L, "b")).toDF("doc_id", "lang")
      .write.format("graft-docs").option("path", p).mode("append").save()
    val files = graft.sources.DocsConnector.listFiles(p)
    files.map(f => new java.io.File(f).getName).distinct should have size
      files.size.toLong
    spark.read.format("graft-docs").option("path", p)
      .option("schema", "doc_id BIGINT, lang STRING").load()
      .orderBy("doc_id").as[(Long, String)].collect() shouldBe
      Array((1L, "a"), (2L, "b"))
  }

  test("micro-batch stream: offsets are the committed file set, batches exact set differences") {
    val p = java.nio.file.Files
      .createTempDirectory("graft_docs_mbs_").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "lang")
      .write.format("graft-docs").option("path", p).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("doc_id BIGINT, lang STRING")
    val stream = new graft.sources.DocsMicroBatchStream(
      p, schema, schema, Array.empty, -1)
    val start = stream.initialOffset()
    val mid = stream.latestOffset()
    // batch 1 = everything committed so far
    val b1 = stream.planInputPartitions(start, mid)
    b1.length shouldBe graft.sources.DocsConnector.listFiles(p).size
    // offsets survive the checkpoint round trip
    stream.deserializeOffset(mid.json()).json() shouldBe mid.json()
    // a second wave appends new files; the next batch is EXACTLY them
    Seq((3L, "c")).toDF("doc_id", "lang")
      .write.format("graft-docs").option("path", p).mode("append").save()
    val end = stream.latestOffset()
    val b2 = stream.planInputPartitions(mid, end)
    b2.length shouldBe
      (graft.sources.DocsConnector.listFiles(p).size - b1.length)
    // replaying the same (start, end) pair plans the same files —
    // deterministic micro-batches
    stream.planInputPartitions(mid, end)
      .map(_.asInstanceOf[graft.sources.DocsInputPartition].file)
      .toSeq shouldBe
      b2.map(_.asInstanceOf[graft.sources.DocsInputPartition].file).toSeq
    // caught-up: no new files → empty batch
    stream.planInputPartitions(end, stream.latestOffset()) shouldBe empty
  }
}
