package graft

import graft.ops.CoreOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeColumns strips, lowercases, underscores (DAG:62-69)") {
    val df = Seq((1, "x")).toDF(" Event ID ", "EVENT Type")
    CoreOps.normalizeColumns(df).columns shouldBe Array("event_id", "event_type")
  }

  test("alignSchema adds missing columns as typed nulls, casts, drops extras") {
    val df = Seq(("7", "a", "junk")).toDF("id", "name", "extra")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("missing_ts", TimestampType)))
    val out = CoreOps.alignSchema(df, target)
    out.schema shouldBe target
    val r = out.head()
    r.getLong(0) shouldBe 7L
    r.getString(1) shouldBe "a"
    r.isNullAt(2) shouldBe true
  }

  test("alignSchema cast failure coerces to null (pd.to_datetime errors=coerce analog)") {
    val df = Seq(("not-a-number")).toDF("id")
    val out = CoreOps.alignSchema(df, StructType(Seq(StructField("id", LongType))))
    out.head().isNullAt(0) shouldBe true
  }

  test("windowPredicate is half-open [start, end) OR'd across columns (DAG:124-129)") {
    val df = Seq(
      (1L, "2024-01-10 00:00:00", "2023-01-01 00:00:00"), // created in window
      (2L, "2023-01-01 00:00:00", "2024-01-10 00:00:00"), // updated in window
      (3L, "2024-01-11 00:00:00", null),                  // end boundary: excluded
      (4L, "2024-01-10 00:00:00", null),                  // start boundary: included
      (5L, "2023-01-01 00:00:00", "2023-06-01 00:00:00")) // outside
      .toDF("id", "created", "updated")
      .select(col("id"), col("created").cast(TimestampType).as("created"),
        col("updated").cast(TimestampType).as("updated"))
    val kept = df.filter(CoreOps.windowPredicate(Seq("created", "updated"),
        "2024-01-10 00:00:00", "2024-01-11 00:00:00"))
      .select("id").as[Long].collect().sorted
    kept shouldBe Array(1L, 2L, 4L)
  }

  test("flattenJson extracts scalar keys (JSONB ->> analog, DAG:296-307)") {
    val df = Seq((1L, """{"k": 42, "name": "x"}"""), (2L, null))
      .toDF("id", "props")
    val out = CoreOps.flattenJson(df, "props", Seq("k", "name")).orderBy("id")
    out.columns should contain allOf ("props_k", "props_name")
    val rows = out.collect()
    rows(0).getAs[String]("props_k") shouldBe "42"
    rows(0).getAs[String]("props_name") shouldBe "x"
    rows(1).getAs[String]("props_k") shouldBe null
  }

  test("flattenJsonTyped parses once with schema and flattens typed fields") {
    val df = Seq((1L, """{"k": 42}"""), (2L, """{"k": "oops"}""")).toDF("id", "props")
    val out = CoreOps.flattenJsonTyped(df, "props",
      StructType(Seq(StructField("k", LongType)))).orderBy("id")
    out.schema("props_k").dataType shouldBe LongType
    val rows = out.collect()
    rows(0).getAs[Long]("props_k") shouldBe 42L
    rows(1).isNullAt(rows(1).fieldIndex("props_k")) shouldBe true
  }

  test("serializeNested turns struct columns into JSON strings (DAG:71-74)") {
    val df = Seq((1L, ("a", 2L))).toDF("id", "nested")
    val out = CoreOps.serializeNested(df, Seq("nested"))
    out.schema("nested").dataType shouldBe StringType
    out.head().getString(1) shouldBe """{"_1":"a","_2":2}"""
  }

  test("tagRun + selectRun round-trip (DAG:184,310)") {
    val df = Seq((1L), (2L)).toDF("id")
    val tagged = CoreOps.tagRun(df, "r1")
    tagged.columns should contain("run_id")
    CoreOps.selectRun(tagged, "r1").count() shouldBe 2
    CoreOps.selectRun(tagged, "r2").count() shouldBe 0
  }

  test("dedupExact keeps one deterministic row per key") {
    val df = Seq((1L, "a", 30L), (1L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L))
      .toDF("k1", "k2", "tie")
    val out = CoreOps.dedupExact(df, Seq("k1", "k2"), "tie")
      .orderBy("k1", "k2").as[(Long, String, Long)].collect()
    out shouldBe Array((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L))
  }

  test("dedupLatest keeps newest version per key") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "old"),
      (1L, "2024-06-01 00:00:00", "new"),
      (2L, "2024-03-01 00:00:00", "only"))
      .toDF("k", "v", "payload")
      .withColumn("v", col("v").cast(TimestampType))
    val out = CoreOps.dedupLatest(df, "k", "v", "payload")
      .orderBy("k").select("payload").as[String].collect()
    out shouldBe Array("new", "only")
  }

  test("upsert: partial update set mirrors ON CONFLICT DO UPDATE (DAG:311-315)") {
    val target = Seq(
      (1L, "t_keep", "t_upd"),   // conflicting key
      (2L, "t_only", "t_only"))  // target-only key
      .toDF("id", "immutable", "mutable")
    val updates = Seq(
      (1L, "u_keep", "u_upd"),   // conflicts: only `mutable` may change
      (3L, "u_new", "u_new"))    // new key: inserted whole
      .toDF("id", "immutable", "mutable")
    val out = CoreOps.upsert(target, updates, "id", Seq("mutable"))
      .orderBy("id").as[(Long, String, String)].collect()
    out shouldBe Array(
      (1L, "t_keep", "u_upd"),   // non-update col keeps target, update col takes update
      (2L, "t_only", "t_only"),  // untouched
      (3L, "u_new", "u_new"))    // inserted
  }

  test("upsert is idempotent: applying same updates twice == once") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v")
    val updates = Seq((2L, "B", 20.0), (3L, "c", 3.0)).toDF("id", "s", "v")
    val once = CoreOps.upsert(target, updates, "id", Seq("v"))
    val twice = CoreOps.upsert(once, updates, "id", Seq("v"))
    twice.orderBy("id").collect() shouldBe once.orderBy("id").collect()
  }

  test("upsert rejects mismatched schemas") {
    val t = Seq((1L, "a")).toDF("id", "x")
    val u = Seq((1L, "a")).toDF("id", "y")
    an[IllegalArgumentException] should be thrownBy
      CoreOps.upsert(t, u, "id", Seq("x"))
  }

  test("reconcile reports counts and ok flag (DAG:375-422)") {
    val src = Seq(1, 2, 3).toDF("x")
    val ok = CoreOps.reconcile(src, src).head()
    (ok.getLong(0), ok.getLong(1), ok.getBoolean(2)) shouldBe (3L, 3L, true)
    val bad = CoreOps.reconcile(src, src.limit(2)).head()
    bad.getBoolean(2) shouldBe false
    an[IllegalStateException] should be thrownBy
      CoreOps.reconcileOrThrow(src, src.limit(2))
  }

  test("windowedExtract composes scan+project+filter+sort (DAG:94-132)") {
    val src = sources.Stores.table(spark, sf0001, "events")
    val out = CoreOps.windowedExtract(src, Seq("event_id", "ts"), Seq("ts"),
      "2024-01-05 00:00:00", "2024-01-20 00:00:00", sortKeys = Seq("ts", "event_id"))
    out.columns shouldBe Array("event_id", "ts")
    out.count() should be > 0L
    // pushdown check: filter must reach the parquet scan
    val plan = out.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
  }
}
