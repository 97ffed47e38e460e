package graft

import graft.ops.TemporalOps
import graft.plans.GraftPlanner
import graft.sources.Stores
import org.apache.spark.sql.functions._

/** The custom whole-operator stack: logical IntervalJoin + RewriteIntervalJoin
  * rule + IntervalJoinStrategy + IntervalJoinExec physical operator. */
class IntervalJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def intervals30 = spark.range(0, 30).select(
    col("id").as("window_id"),
    expr("TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL '16' HOUR").as("w_start"),
    expr("TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL '16' HOUR + INTERVAL '12' HOUR")
      .as("w_end"))

  test("pure range join plans as IntervalJoinExec, not BroadcastNestedLoopJoin") {
    val ev = Stores.table(spark, sf0001, "events").select("event_id", "ts")
    val joined = TemporalOps.pointInIntervalJoin(ev, intervals30,
      "ts", "w_start", "w_end")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("IntervalJoin")
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("BroadcastExchange")   // proper broadcast, not collect
  }

  test("IntervalJoinExec results are identical to the nested-loop join") {
    val ev = Stores.table(spark, sf0001, "events").select("event_id", "ts")
    val fast = TemporalOps.pointInIntervalJoin(ev, intervals30,
        "ts", "w_start", "w_end")
      .select("event_id", "window_id").orderBy("event_id", "window_id").collect()
    // same join WITHOUT the rewrite registered → Spark's BNLJ reference
    val naiveSession = spark.newSession()
    val ev2 = Stores.table(naiveSession, sf0001, "events")
      .select("event_id", "ts")
    val iv2 = naiveSession.range(0, 30).select(
      col("id").as("window_id"),
      expr("TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL '16' HOUR").as("w_start"),
      expr("TIMESTAMP '2024-01-01 00:00:00' + id * INTERVAL '16' HOUR + INTERVAL '12' HOUR")
        .as("w_end"))
    val naive = ev2.join(iv2,
        ev2("ts") >= iv2("w_start") && ev2("ts") <= iv2("w_end"))
      .select("event_id", "window_id").orderBy("event_id", "window_id")
    naive.queryExecution.executedPlan.toString should include("BroadcastNestedLoopJoin")
    fast shouldBe naive.collect()
    fast.length should be > 0
  }

  test("overlapping intervals: every containing interval matches") {
    GraftPlanner.register(spark)
    val pts = Seq((1L, ts("2024-01-01 05:00:00")), (2L, ts("2024-03-01 00:00:00")))
      .toDF("pid", "pts")
    val iv = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")),  // contains
      (11L, ts("2024-01-01 04:00:00"), ts("2024-01-01 23:00:00")),  // contains
      (12L, ts("2024-01-01 05:30:00"), ts("2024-01-01 07:00:00")),  // starts after
      (13L, ts("2023-12-31 00:00:00"), ts("2024-01-01 04:59:00")))  // ends before
      .toDF("iid", "s", "e")
    val out = pts.join(iv, col("pts") >= col("s") && col("pts") <= col("e"))
      .select("pid", "iid").orderBy("pid", "iid")
    out.queryExecution.executedPlan.toString should include("IntervalJoin")
    out.as[(Long, Long)].collect() shouldBe Array((1L, 10L), (1L, 11L))
  }

  test("rule leaves equi-key + range joins alone (already well-planned)") {
    GraftPlanner.register(spark)
    val ev = Stores.table(spark, sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
    val j = p.join(c, col("user_id") === col("cu") &&
      col("cts") <= col("pts") && col("cts") >= col("pts") - expr("INTERVAL 60 MINUTES"))
    j.collect()
    j.queryExecution.executedPlan.toString should not include "IntervalJoin"
  }

  test("mirrored direction (points on the right) rewrites with restored output") {
    GraftPlanner.register(spark)
    val pts = Seq((1L, ts("2024-01-01 05:00:00"))).toDF("pid", "pts")
    val iv = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")))
      .toDF("iid", "s", "e")
    val out = iv.join(pts, col("pts") >= col("s") && col("pts") <= col("e"))
    out.queryExecution.executedPlan.toString should include("IntervalJoin")
    out.columns shouldBe Array("iid", "s", "e", "pid", "pts")  // original order
    out.select("iid", "pid").as[(Long, Long)].collect() shouldBe Array((10L, 1L))
  }

  test("size guard: an interval side over the broadcast budget is not rewritten") {
    GraftPlanner.register(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")  // budget = 32 B
      val pts = Seq((1L, ts("2024-01-01 05:00:00"))).toDF("pid", "pts")
      val iv = (0L until 100L).map(i =>
          (i, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")))
        .toDF("iid", "s", "e")   // ~2.4 KB estimated — over the 32 B budget
      val out = pts.join(iv, col("pts") >= col("s") && col("pts") <= col("e"))
      out.queryExecution.optimizedPlan.toString should not include "IntervalJoin"
      out.count() shouldBe 100L   // vanilla plan still answers correctly
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcast opt-out (threshold = -1) disables the rewrite entirely") {
    GraftPlanner.register(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pts = Seq((1L, ts("2024-01-01 05:00:00"))).toDF("pid", "pts")
      val iv = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")))
        .toDF("iid", "s", "e")
      val out = pts.join(iv, col("pts") >= col("s") && col("pts") <= col("e"))
      // the user said "never broadcast" — no IntervalJoin (which broadcasts)
      out.queryExecution.optimizedPlan.toString should not include "IntervalJoin"
      out.count() shouldBe 1L
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
