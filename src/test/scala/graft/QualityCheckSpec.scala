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

  test("tCloseness: skewed-but-diverse cells score exact hand-computed EMD") {
    // two values split 50/50 globally; cell A all 1s, cell B all 2s —
    // both cells are l-diverse-looking at cell level? no: each holds one
    // value, but the POINT is the EMD: |S₁| = ½ → EMD = ½ for both
    val polar = (Seq.fill(6)(("A", 1.0)) ++ Seq.fill(6)(("B", 2.0)))
      .toDF("cell", "v")
    val p = QualityCheck.tCloseness(polar, Seq("cell"), "v", t = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    p("A") shouldBe ((6L, 0.5, false))
    p("B") shouldBe ((6L, 0.5, false))
    // three-value support, two cells of different shape vs the global mix
    val skewOut = QualityCheck.tCloseness(
      (Seq.fill(3)(("skew", 0.0)) ++
        (1 to 3).flatMap(_ => Seq(("flat", 0.0), ("flat", 50.0), ("flat", 100.0))))
        .toDF("cell", "v"),
      Seq("cell"), "v", t = 0.45)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    // global: 0→6, 50→3, 100→3 (N=12). skew cell (n=3, all 0):
    // S₁ = 3·12−6·3 = 18; S₂ = 18−9 = 9; S₃ = 0 (units 1/(3·12));
    // EMD = (18+9)/(2·36) = 0.375
    skewOut("skew")._1 shouldBe 0.375
    skewOut("skew")._2 shouldBe true
    // flat cell (n=9, props 1/3 each vs global ½,¼,¼): S₁ = 9·12−6·9 =
    // 54... sign negative: 36−54 = −18; |−18|+|−9|+0 = 27 → 27/(2·108) = 0.125
    skewOut("flat")._1 shouldBe 0.125
    // single-value support: m = 1 → EMD 0 by definition
    val mono = Seq(("X", 7.0), ("Y", 7.0)).toDF("cell", "v")
    QualityCheck.tCloseness(mono, Seq("cell"), "v", t = 0.01)
      .collect().foreach { r =>
        r.getDouble(2) shouldBe 0.0; r.getBoolean(3) shouldBe true
      }
  }

  test("functionalDependency: verdict per determinant, null contract") {
    val df = Seq(
      (Some("b1"), Some("m1")), (Some("b1"), Some("m1")),
      (Some("b2"), Some("m1")), (Some("b2"), Some("m2")),   // violation
      (None: Option[String], Some("m3")),                    // null det: excluded
      (Some("b3"), None: Option[String]))                    // null dep: no value
      .toDF("det", "dep")
    val out = QualityCheck.functionalDependency(df, "det", "dep")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    out.keySet shouldBe Set("b1", "b2", "b3")
    out("b1") shouldBe ((2L, 1L, true))
    out("b2") shouldBe ((2L, 2L, false))
    out("b3") shouldBe ((1L, 0L, true))
  }

  test("dpNoisyCounts: deterministic per release, fresh noise per releaseId, bounded") {
    val df = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c"))
      .toDF("g")
    val r1 = QualityCheck.dpNoisyCounts(df, "g", epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r1b = QualityCheck.dpNoisyCounts(df, "g", epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1 shouldBe r1b // rerun releases IDENTICAL values — the PRF contract
    // a different releaseId draws fresh noise (spends fresh ε)
    val r2 = QualityCheck.dpNoisyCounts(df, "g", epsilon = 0.5, releaseId = "r2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1 should not equal r2
    // |noise| ≤ (1/ε)·ln(2⁶⁰) ≈ 41.6/ε — the PRF's worst draw is bounded
    val truth = Map("a" -> 40.0, "b" -> 25.0, "c" -> 9.0)
    r1.foreach { case (g, v) =>
      math.abs(v - truth(g)) should be <= 42.0 / 0.5
    }
    // noise is actually present (not all three counts released exactly)
    truth.exists { case (g, n) => math.abs(r1(g) - n) > 1e-6 } shouldBe true
  }
}
