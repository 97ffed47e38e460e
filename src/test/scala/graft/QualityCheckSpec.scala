package graft

import graft.ops.QualityCheck
import graft.ops.QualityCheck._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QualityCheckSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alpha", "2024-06-01 00:00:00", "10"),
    (2L, "beta", "2024-01-01 00:00:00", "x"),     // bad int
    (2L, "Gamma7", "2023-01-01 00:00:00", "30"),  // dup key + regex violation
    (4L, null, "2024-02-01 00:00:00", null))      // null name
    .toDF("id", "name", "ts", "num")
    .withColumn("ts", col("ts").cast(TimestampType))

  test("report runs all rules in one pass and counts violations") {
    val rep = QualityCheck.report(df, Seq(
      NotNull("name"), Unique("id"), Regex("name", "^[a-z]+$"),
      ValidType("num", "bigint"),
      Freshness("ts", java.sql.Timestamp.valueOf("2024-05-01 00:00:00")),
      Predicate("id_positive", col("id") > 0))).head()
    rep.getAs[Long]("n_rows") shouldBe 4L
    rep.getAs[Long]("not_null_name") shouldBe 1L
    rep.getAs[Long]("unique_id") shouldBe 1L
    rep.getAs[Long]("regex_name") shouldBe 1L       // Gamma7
    rep.getAs[Long]("type_num_bigint") shouldBe 1L  // "x"
    rep.getAs[Long]("freshness_ts") shouldBe 0L     // max ts is 2024-06-01
    rep.getAs[Long]("id_positive") shouldBe 0L
  }

  test("freshness violation when max(ts) below threshold") {
    val rep = QualityCheck.report(df,
      Seq(Freshness("ts", java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))).head()
    rep.getAs[Long]("freshness_ts") shouldBe 1L
  }

  test("check throws on any violation, mirrors soda hard-fail (DAG:361-362)") {
    an[IllegalStateException] should be thrownBy
      QualityCheck.check(df, Seq(NotNull("name")))
    noException should be thrownBy
      QualityCheck.check(df, Seq(NotNull("id"), Predicate("pos", col("id") > 0)))
  }

  test("report is empty-input safe (violations coalesce to 0)") {
    val empty = df.filter(lit(false))
    val rep = QualityCheck.report(empty, Seq(NotNull("name"), Unique("id"))).head()
    rep.getAs[Long]("n_rows") shouldBe 0L
    rep.getAs[Long]("not_null_name") shouldBe 0L
    rep.getAs[Long]("unique_id") shouldBe 0L
  }

  test("quarantine tags rows with the FIRST violated rule; split is total") {
    val rules = Seq(
      NotNull("name"),                          // row 4 fails here first
      Regex("name", "^[a-z]+$"),                // row 3 fails here
      ValidType("num", "bigint"))               // row 2 fails here
    val tagged = QualityCheck.quarantine(df, rules)
      .select("id", "name", "qc_fail_reason")
      .orderBy("id", "name").collect()
    tagged.map(r => Option(r.getString(2))) shouldBe Array(
      None,                                     // (1, alpha) clean
      Some("regex_name"),                       // (2, Gamma7) — G sorts before b
      Some("type_num_bigint"),                  // (2, beta) bad int
      Some("not_null_name"))                    // (4, null name)
    // pass/quarantine split is a total partition of the input
    val good = QualityCheck.passedRows(df, rules)
    val bad = QualityCheck.quarantinedRows(df, rules)
    good.count() + bad.count() shouldBe df.count()
    good.columns should not contain "qc_fail_reason"
    // dataset-level rules don't quarantine rows: dup id=2 rows stay clean-side
    // for Unique (they fail the aggregate gate, not the row filter)
    QualityCheck.quarantine(df, Seq(Unique("id")))
      .filter(col("qc_fail_reason").isNotNull).count() shouldBe 0L
  }

  test("Predicate with NULL result: gate and quarantine agree (null = fail)") {
    val d = Seq[(java.lang.Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, -1L))
      .toDF("id", "num")
    val rule = Predicate("num_positive", col("num") > 0)
    // aggregate gate: null predicate result counts as a violation
    QualityCheck.report(d, Seq(rule)).head().getAs[Long]("num_positive") shouldBe 2L
    // row side-output: the SAME two rows are quarantined
    QualityCheck.quarantinedRows(d, Seq(rule))
      .select("id").as[Long].collect().sorted shouldBe Array(2L, 3L)
  }

  test("report is a single aggregation (one scan) regardless of rule count") {
    val rep = QualityCheck.report(df, Seq(NotNull("name"), Unique("id"),
      Regex("name", "^[a-z]+$"), ValidType("num", "bigint")))
    // physical plan contains exactly one aggregate pair (partial+final) over one scan
    val scans = rep.queryExecution.executedPlan.collectLeaves().size
    scans shouldBe 1
  }

  test("observed: QC metrics accumulate as a side-product of the write") {
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v")
    val rules = Seq(NotNull("v"))
    val (inst, obs) = QualityCheck.observed(df, rules)
    val out = java.nio.file.Files.createTempDirectory("graft_obs_").toString
    inst.write.mode("overwrite").parquet(s"$out/t")   // the ONLY action
    obs.get shouldBe Map("n_rows" -> 3L, "not_null_v" -> 1L)
    // identical numbers to the standalone (second-scan) report
    QualityCheck.report(df, rules).head().toSeq shouldBe Seq(3L, 1L)
    // Unique needs a distinct aggregate — CollectMetrics forbids it
    an[IllegalArgumentException] should be thrownBy
      QualityCheck.observed(df, Seq(Unique("id")))
    // two instrumented frames may meet in ONE plan (default names unique)
    val (x, ox) = QualityCheck.observed(df, rules)
    val (y, oy) = QualityCheck.observed(df, rules)
    x.join(y.withColumnRenamed("v", "v2"), "id")
      .write.mode("overwrite").parquet(s"$out/j")
    ox.get("n_rows") shouldBe 3L
    oy.get("n_rows") shouldBe 3L
  }

  test("lDiversity flags the k-anonymous-but-leaky cell") {
    // cell A: 4 rows but ONE sensitive value (k-anonymous, zero
    // diversity); cell B: 3 rows, 3 values
    val df = Seq(("A", Some(10.0)), ("A", Some(10.0)), ("A", Some(10.0)),
      ("A", Some(10.0)), ("B", Some(1.0)), ("B", Some(2.0)),
      ("B", Some(3.0)),
      // NULLs carry no diversity — cell C must NOT pass on {42, null, null}
      // — but they DO count toward release volume (n_rows = all 3 rows)
      ("C", Some(42.0)), ("C", None), ("C", None)).toDF("cell", "bal")
    val out = QualityCheck.lDiversity(df, Seq("cell"), "bal", l = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    out("A") shouldBe ((4L, 1L, false))
    out("B") shouldBe ((3L, 3L, true))
    out("C") shouldBe ((3L, 1L, false))
  }
}
