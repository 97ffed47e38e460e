package graft

import graft.ops.TemporalOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin matches greatest right ts <= left ts per key, left outer") {
    val left = Seq(
      (100L, 1L, "2024-01-01 10:00:00"),
      (101L, 1L, "2024-01-01 12:00:00"),
      (102L, 2L, "2024-01-01 09:00:00")) // no prior right row
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampType))
    val right = Seq(
      (200L, 1L, "2024-01-01 09:30:00"),
      (201L, 1L, "2024-01-01 11:00:00"),
      (202L, 2L, "2024-01-01 09:30:00")) // after left's 09:00 → no match
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampType))
    val out = TemporalOps.asofJoin(left, right, "user_id", "ts", "ts",
        "event_id", Seq("event_id"))
      .select("event_id", "asof_event_id").orderBy("event_id")
      .as[(Long, Option[Long])].collect()
    out shouldBe Array(
      (100L, Some(200L)),  // 09:30 is the latest <= 10:00
      (101L, Some(201L)),  // 11:00 is the latest <= 12:00
      (102L, None))        // nothing at or before 09:00
  }

  test("asofJoin is inclusive and breaks right-side ts ties by max tiebreak") {
    val left = Seq((1L, 9L, "2024-01-01 10:00:00"))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampType))
    val right = Seq(
      (50L, 9L, "2024-01-01 10:00:00"),   // same instant: included
      (51L, 9L, "2024-01-01 10:00:00"))   // tie → larger event_id wins
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampType))
    TemporalOps.asofJoin(left, right, "user_id", "ts", "ts",
        "event_id", Seq("event_id"))
      .head().getAs[Long]("asof_event_id") shouldBe 51L
  }

  test("markovRemovalAttribution: hand-solvable chain incl. journey " +
    "truncation at the first conversion") {
    // u1: click→CONV; u2: view→click→CONV; u3: view→NULL; u4: direct CONV
    // (u4's post-purchase click must be truncated out of the journey).
    // T(START)={click .25, view .5, CONV .25}; T(click)={CONV 1};
    // T(view)={click .5, NULL .5} → p(START)=0.75;
    // remove click: p=0.25 → effect 2/3; remove view: p=0.5 → effect 1/3
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (1L, "2024-01-01 10:05:00", 2L, "purchase"),
      (2L, "2024-01-01 11:00:00", 3L, "view"),
      (2L, "2024-01-01 11:01:00", 4L, "click"),
      (2L, "2024-01-01 11:02:00", 5L, "purchase"),
      (3L, "2024-01-01 12:00:00", 6L, "view"),
      (4L, "2024-01-01 13:00:00", 7L, "purchase"),
      (4L, "2024-01-01 14:00:00", 8L, "click")) // after conversion: cut
      .map { case (u, t, i, e) => (u, ts(t), i, e) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TemporalOps.markovRemovalAttribution(ev, "user_id", "ts",
        "event_id", "event_type", convType = "purchase", iters = 50)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    out shouldBe Array(
      ("click", 0.666667, 0.666667),
      ("view", 0.333333, 0.333333))
  }

  test("markovRemovalAttribution: a never-converting chain reports NULLs") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 2L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = TemporalOps.markovRemovalAttribution(ev, "user_id", "ts",
      "event_id", "event_type", convType = "purchase").collect()
    out.length shouldBe 2
    all(out.map(r => r.isNullAt(1) && r.isNullAt(2))) shouldBe true
  }

  test("sessionize starts a new session when gap exceeds threshold") {
    val df = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 10:20:00"),   // 20 min gap → same session
      (3L, 10L, "2024-01-01 12:00:00"),   // 100 min gap → new session
      (4L, 11L, "2024-01-01 10:00:00"))   // other user → own session 1
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampType))
    val out = TemporalOps.sessionize(df, "user_id", "ts", "event_id", 3600L)
      .select("event_id", "session_id").orderBy("event_id")
      .as[(Long, Long)].collect()
    out shouldBe Array((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L))
  }

  test("sessionStats rolls up bounds, duration, counts") {
    val df = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 10:30:00"),
      (3L, 10L, "2024-01-01 13:00:00"))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast(TimestampType))
    val out = TemporalOps.sessionStats(df, "user_id", "ts", "event_id", 3600L)
      .orderBy("session_id").collect()
    out.length shouldBe 2
    out(0).getAs[Long]("n_events") shouldBe 2L
    out(0).getAs[Long]("duration_s") shouldBe 1800L
    out(0).getAs[java.sql.Timestamp]("session_start") shouldBe ts("2024-01-01 10:00:00")
    out(1).getAs[Long]("n_events") shouldBe 1L
    out(1).getAs[Long]("duration_s") shouldBe 0L
  }

  test("gapFill materializes missing buckets and forward-fills the last observation") {
    val df = Seq(
      (1L, 10L, "2024-01-01 09:00:00", 1.0),
      (2L, 10L, "2024-01-01 10:00:00", 2.0),   // same day, later ts → wins day 1
      (3L, 10L, "2024-01-04 08:00:00", 7.0),   // days 2-3 missing → filled with 2.0
      (4L, 11L, "2024-01-02 00:00:00", 5.0))   // single-day user: 1 row, observed
      .toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast(TimestampType))
    val out = TemporalOps.gapFill(df, "user_id", "ts", "event_id", "value", "day")
      .orderBy("user_id", "bucket")
      .select("user_id", "value_ff", "observed")
      .as[(Long, Double, Boolean)].collect()
    out shouldBe Array(
      (10L, 2.0, true), (10L, 2.0, false), (10L, 2.0, false), (10L, 7.0, true),
      (11L, 5.0, true))
  }

  test("gapFill picks the LAST same-bucket observation by (ts, tieBreak)") {
    val df = Seq(
      (5L, 1L, "2024-01-01 10:00:00", 1.0),
      (9L, 1L, "2024-01-01 10:00:00", 3.0),   // ts tie → larger event_id wins
      (1L, 1L, "2024-01-01 11:00:00", 9.0))   // latest ts beats both
      .toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast(TimestampType))
    TemporalOps.gapFill(df, "user_id", "ts", "event_id", "value", "day")
      .head().getAs[Double]("value_ff") shouldBe 9.0
  }

  test("funnel requires strict step order and reports depth") {
    val df = Seq(
      // user 1: full funnel in order
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:05:00", "click"),
      (3L, 1L, "2024-01-01 10:10:00", "purchase"),
      // user 2: purchase BEFORE click → funnel stops at depth 2
      (4L, 2L, "2024-01-01 10:00:00", "view"),
      (5L, 2L, "2024-01-01 09:00:00", "purchase"),
      (6L, 2L, "2024-01-01 11:00:00", "click"),
      // user 3: never viewed → depth 0 even though it clicked
      (7L, 3L, "2024-01-01 10:00:00", "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))
    val steps = Seq(col("event_type") === "view", col("event_type") === "click",
      col("event_type") === "purchase")
    val out = TemporalOps.funnel(df, "user_id", "ts", steps)
      .orderBy("user_id").select("user_id", "depth")
      .as[(Long, Long)].collect()
    out shouldBe Array((1L, 3L), (2L, 2L), (3L, 0L))
  }

  test("funnel step at the same instant as the previous step does not count") {
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:00:00", "click"))  // not strictly after
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))
    TemporalOps.funnel(df, "user_id", "ts",
        Seq(col("event_type") === "view", col("event_type") === "click"))
      .head().getAs[Long]("depth") shouldBe 1L
  }

  test("debounce: bursts collapse to their head; suppressed events reset the timer") {
    // user 1: events at t=0,5,10,30 with gap 8 — 5 and 10 are suppressed
    // (each within 8s of its PREDECESSOR, kept or not), 30 survives
    // (gap to 10 is 20); user 2: a lone event always survives
    val df = Seq((1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 10L),
      (4L, 1L, 30L), (5L, 2L, 3L))
      .toDF("event_id", "user_id", "sec")
      .withColumn("ts", col("sec").cast(TimestampType))
    val kept = TemporalOps.debounce(df, "user_id", "ts", "event_id",
      gapSeconds = 8L).select("event_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 4L, 5L)
    // null timestamps never suppress: the null-ts row AND its follower
    // survive (a null gap is not burst evidence)
    val withNull = df.unionByName(
      Seq((6L, 3L)).toDF("event_id", "user_id")
        .withColumn("sec", lit(null).cast("long"))
        .withColumn("ts", lit(null).cast(TimestampType))
        .select("event_id", "user_id", "sec", "ts"))
      .unionByName(Seq((7L, 3L, 100L)).toDF("event_id", "user_id", "sec")
        .withColumn("ts", col("sec").cast(TimestampType)))
    val kept2 = TemporalOps.debounce(withNull, "user_id", "ts", "event_id",
      gapSeconds = 8L).select("event_id").collect().map(_.getLong(0)).toSet
    kept2 shouldBe Set(1L, 4L, 5L, 6L, 7L)
  }

  test("cusumChangePoint: pivots on the level shift with exact magnitude") {
    import spark.implicits._
    // 6 days at 10, then 6 days at 20: mean 15, CUSUM most extreme at the
    // LAST day of the old level — |S₆| = 6·5 = 30 dollars of integrated
    // deviation, per-day-normalized 30/12 = 2.5, direction 'up'
    val rows = (1 to 12).map { day =>
      (f"2024-01-$day%02d 08:30:00", if (day <= 6) 10.0 else 20.0)
    }
    val df = rows.toDF("tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val r = TemporalOps.cusumChangePoint(df, "ts", "value").head()
    r.getAs[java.sql.Timestamp]("at_day").toString should startWith("2024-01-06")
    r.getAs[Long]("n_days") shouldBe 12L
    r.getAs[Double]("cusum_peak") shouldBe 2.5
    r.getAs[String]("direction") shouldBe "up"
    // mirrored series (high first): same magnitude, direction 'down'
    val mirrored = rows.map { case (ts, v) => (ts, 30.0 - v) }
      .toDF("tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val m = TemporalOps.cusumChangePoint(mirrored, "ts", "value").head()
    m.getAs[Double]("cusum_peak") shouldBe 2.5
    m.getAs[String]("direction") shouldBe "down"
    // flat series: zero cusum everywhere; earliest day wins the tie
    val flat = rows.map { case (ts, _) => (ts, 7.0) }.toDF("tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val f = TemporalOps.cusumChangePoint(flat, "ts", "value").head()
    f.getAs[Double]("cusum_peak") shouldBe 0.0
    f.getAs[java.sql.Timestamp]("at_day").toString should startWith("2024-01-01")
  }

  test("burstiness: -1 on a regular clock, positive on bursts, minGaps gate") {
    import spark.implicits._
    // u1 ticks every 10s (σ = 0 → B = −1); u2 bursts 1,1,1 then a 97s
    // silence (B > 0); u3 has one gap only → filtered
    val ev = (Seq(0L, 10L, 20L, 30L).map(t => ("u1", t)) ++
      Seq(0L, 1L, 2L, 3L, 100L).map(t => ("u2", t)) ++
      Seq(0L, 5L).map(t => ("u3", t))).zipWithIndex
      .map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("u", "sec", "eid")
      .withColumn("ts", col("sec").cast(TimestampType))
    val out = TemporalOps.burstiness(ev, "u", "ts", "eid")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    out.keySet shouldBe Set("u1", "u2")
    out("u1") shouldBe ((3L, 10.0, -1.0))
    val (n2, mu2, b2) = out("u2")
    n2 shouldBe 4L
    mu2 shouldBe 25.0
    // σ² = (1+1+1+9409)/4 − 625 = 1728; B = (√1728 − 25)/(√1728 + 25)
    val sigma = math.sqrt(1728.0)
    b2 shouldBe (math.rint((sigma - 25) / (sigma + 25) * 1e6) / 1e6)
  }

  test("cohortLtv: cumulative per-user revenue by cohort age; null-value users count") {
    import spark.implicits._
    // cohort day1: u1 (10 @day1, 20 @day3), u2 (30 @day1), u4 (activity
    // but no valued events — still a cohort member); cohort day2: u3 (5)
    val ev = Seq(
      ("u1", "2024-07-01 09:00:00", Some(10.0)),
      ("u1", "2024-07-03 09:00:00", Some(20.0)),
      ("u2", "2024-07-01 10:00:00", Some(30.0)),
      ("u4", "2024-07-01 11:00:00", None: Option[Double]),
      ("u3", "2024-07-02 09:00:00", Some(5.0)))
      .toDF("u", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = TemporalOps.cohortLtv(ev, "u", "ts", "value")
      .collect().map(r => (r.getAs[java.sql.Timestamp]("cohort").toString
        .take(10), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // day-1 cohort has THREE users; 40/3 at age 0, 60/3 at age 2
    out(("2024-07-01", 0L)) shouldBe ((3L, 13.333333))
    out(("2024-07-01", 2L)) shouldBe ((3L, 20.0))
    out(("2024-07-02", 0L)) shouldBe ((1L, 5.0))
    out.size shouldBe 3
  }

  test("activityStreaks: islands found, earliest longest run wins ties") {
    import spark.implicits._
    def at(day: Int) = f"2024-05-$day%02d 13:00:00"
    // u1: days {1,2,3, 5,6, 10} → 6 active, longest 3 starting day 1;
    // u2: {1,2, 5,6} → tie of two 2-runs, EARLIEST start reported;
    // duplicate events inside one day count once
    val ev = (Seq(1, 2, 3, 5, 6, 10).map(d => ("u1", at(d))) ++
      Seq(1, 2, 5, 6).map(d => ("u2", at(d))) ++
      Seq(("u2", "2024-05-01 23:59:00")))
      .toDF("u", "tss").withColumn("ts", to_timestamp(col("tss")))
    val out = TemporalOps.activityStreaks(ev, "u", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          r.getAs[java.sql.Timestamp]("streak_start").toString.take(10)))
      .toMap
    out("u1") shouldBe ((6L, 3L, "2024-05-01"))
    out("u2") shouldBe ((4L, 2L, "2024-05-01"))
  }

  test("transitionMatrix: branching probabilities exact; last events silent") {
    import spark.implicits._
    // users: A = x→y, B = x→z, C = x→y — from x: y 2/3, z 1/3; the
    // terminal y/z events have no successor and contribute nothing
    val ev = Seq(
      ("A", 10L, 1L, "x"), ("A", 20L, 2L, "y"),
      ("B", 10L, 3L, "x"), ("B", 20L, 4L, "z"),
      ("C", 10L, 5L, "x"), ("C", 20L, 6L, "y"))
      .toDF("u", "sec", "eid", "st")
      .withColumn("ts", col("sec").cast(TimestampType))
    val m = TemporalOps.transitionMatrix(ev, "u", "ts", "st", "eid")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    m.keySet shouldBe Set(("x", "y"), ("x", "z"))
    m(("x", "y")) shouldBe ((2L, 0.666667))
    m(("x", "z")) shouldBe ((1L, 0.333333))
    // same-second events order by the tie-break, not arrival order
    val tied = Seq(("A", 10L, 2L, "b"), ("A", 10L, 1L, "a"))
      .toDF("u", "sec", "eid", "st")
      .withColumn("ts", col("sec").cast(TimestampType))
    TemporalOps.transitionMatrix(tied, "u", "ts", "st", "eid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("a", "b"))
  }

  test("topPaths: full journeys ranked, deterministic tie order") {
    import spark.implicits._
    val ev = (
      // three users walk a>b, two walk just a, one walks b>a
      Seq("u1", "u2", "u3").flatMap(u =>
        Seq((u, 10L, 1L, "a"), (u, 20L, 2L, "b"))) ++
      Seq(("u4", 10L, 3L, "a"), ("u5", 10L, 4L, "a")) ++
      Seq(("u6", 10L, 5L, "b"), ("u6", 20L, 6L, "a")))
      .toDF("u", "sec", "eid", "st")
      .withColumn("ts", col("sec").cast(TimestampType))
    val top = TemporalOps.topPaths(ev, "u", "ts", "st", "eid", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    top shouldBe Seq(("a>b", 3L), ("a", 2L), ("b>a", 1L))
    // k truncates after the deterministic (n desc, path asc) order
    TemporalOps.topPaths(ev, "u", "ts", "st", "eid", k = 1)
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a>b")
  }

  test("peakConcurrency: sweep-line count, half-open boundaries, earliest tie") {
    import spark.implicits._
    // [0,10) [5,15) [8,12): all three open during [8,10) → peak 3 at t=8
    val iv = Seq((0L, 10L), (5L, 15L), (8L, 12L)).toDF("s", "e")
    val r = TemporalOps.peakConcurrency(iv, "s", "e").head()
    r.getAs[Long]("peak") shouldBe 3L
    r.getAs[Long]("at_sec") shouldBe 8L
    // half-open: [0,10) and [10,20) never overlap — peak stays 1, and
    // the earliest boundary attaining it wins the tie
    val chain = Seq((0L, 10L), (10L, 20L)).toDF("s", "e")
    val c = TemporalOps.peakConcurrency(chain, "s", "e").head()
    c.getAs[Long]("peak") shouldBe 1L
    c.getAs[Long]("at_sec") shouldBe 0L
    // degenerate intervals (end <= start) are dropped entirely
    val degen = Seq((5L, 5L), (7L, 3L), (1L, 2L)).toDF("s", "e")
    val dd = TemporalOps.peakConcurrency(degen, "s", "e").head()
    dd.getAs[Long]("peak") shouldBe 1L
    dd.getAs[Long]("at_sec") shouldBe 1L
  }

  test("ewmaBaseline: unrolled recursion matches the hand recursion exactly") {
    import spark.implicits._
    // α = 0.5 over [10, 20, 30]: e = [10, 15, 22.5];
    // resid = actual − YESTERDAY's ewma: [null, 10, 15]
    val df = Seq(("2024-02-01 09:00:00", 10.0), ("2024-02-02 09:00:00", 20.0),
      ("2024-02-03 09:00:00", 30.0)).toDF("tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = TemporalOps.ewmaBaseline(df, "ts", "value", alpha = 0.5)
      .collect()
    out.map(_.getAs[Double]("actual")).toSeq shouldBe Seq(10.0, 20.0, 30.0)
    out.map(_.getAs[Double]("ewma")).toSeq shouldBe Seq(10.0, 15.0, 22.5)
    out.head.isNullAt(out.head.fieldIndex("resid")) shouldBe true
    out.drop(1).map(_.getAs[Double]("resid")).toSeq shouldBe Seq(10.0, 15.0)
    // multiple events per day fold into the daily total first
    val doubled = df.union(df)
    TemporalOps.ewmaBaseline(doubled, "ts", "value", alpha = 0.5)
      .collect().map(_.getAs[Double]("ewma")).toSeq shouldBe
      Seq(20.0, 30.0, 45.0)
  }

  test("theilSenSlope: one corrupted day cannot drag the trend") {
    import spark.implicits._
    // clean +2/day for four days, then a 100-spike: OLS would chase the
    // spike; the pairwise-slope median stays exactly 2
    val rows = Seq(10.0, 12.0, 14.0, 16.0, 100.0).zipWithIndex.map {
      case (v, i) => (f"2024-03-${i + 1}%02d 12:00:00", v)
    }
    val df = rows.toDF("tss", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val r = TemporalOps.theilSenSlope(df, "ts", "value").head()
    r.getAs[Long]("n_days") shouldBe 5L
    r.getAs[Long]("n_pairs") shouldBe 10L
    r.getAs[Double]("slope") shouldBe 2.0
    // single day: no pair, no row
    TemporalOps.theilSenSlope(
      Seq(("2024-03-01 12:00:00", 5.0)).toDF("tss", "value")
        .withColumn("ts", to_timestamp(col("tss"))),
      "ts", "value").count() shouldBe 0L
  }

  test("acf: alternating series, gap days as zeros, constant series NULL") {
    def daySeries(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (1 to c).map(i => f"2024-03-${d + 1}%02d 0$i:00:00")
      }.toDF("tss").withColumn("ts", to_timestamp(col("tss")))
    // 10 alternating days 1,3,1,3,… (mean 2): r₁ = −9/10, r₂ = +8/10
    val alt = TemporalOps.acf(
        daySeries(Seq(1, 3, 1, 3, 1, 3, 1, 3, 1, 3)), "ts", maxLag = 3)
      .as[(Long, Long, Double)].collect()
    alt(0) shouldBe ((1L, 9L, -0.9))
    alt(1) shouldBe ((2L, 8L, 0.8))
    alt(2) shouldBe ((3L, 7L, -0.7))
    // a MISSING day is a real zero on the contiguous grid: days 1 and 3
    // have 2 events each, day 2 none → series (2, 0, 2), mean 4/3:
    // r₁ = (2·(2/3)·(−4/3)) / (2·(2/3)² + (4/3)²) = −16/9 / (8/3) = −2/3
    val gap = (Seq("2024-03-01 01:00:00", "2024-03-01 02:00:00",
        "2024-03-03 01:00:00", "2024-03-03 02:00:00"))
      .toDF("tss").withColumn("ts", to_timestamp(col("tss")))
    val g = TemporalOps.acf(gap, "ts", maxLag = 1)
      .as[(Long, Long, Double)].collect()
    g shouldBe Array((1L, 2L, -0.666667))
    // constant series: zero variance → NULL, never NaN
    val c = TemporalOps.acf(daySeries(Seq(2, 2, 2, 2)), "ts", maxLag = 2)
    c.count() shouldBe 2L
    c.filter(col("acf").isNotNull).count() shouldBe 0L
  }

  test("crossCorrelation: hand-computed alternating click/purchase series") {
    // clicks on days 1,3 — purchases on days 2,4: x=(1,0,1,0), y=(0,1,0,1)
    // means 0.5/0.5, dx=dy=1; r₀ = −1 (perfectly out of phase),
    // r₊₁ = r₋₁ = 0.75 (the one-day shift aligns them, edge terms damp)
    val ev = Seq(
      ("2024-03-01 10:00:00", "click"), ("2024-03-02 10:00:00", "purchase"),
      ("2024-03-03 10:00:00", "click"), ("2024-03-04 10:00:00", "purchase"))
      .toDF("tss", "event_type").withColumn("ts", to_timestamp(col("tss")))
    val r = TemporalOps.crossCorrelation(ev, "ts", "event_type",
        "click", "purchase", maxLag = 1)
      .as[(Long, Long, Double)].collect()
    r shouldBe Array((-1L, 3L, 0.75), (0L, 4L, -1.0), (1L, 3L, 0.75))
    // one constant side → NULL (zero variance), never NaN
    val flat = Seq(
      ("2024-03-01 10:00:00", "click"), ("2024-03-02 10:00:00", "click"),
      ("2024-03-01 11:00:00", "purchase"), ("2024-03-02 11:00:00", "purchase"))
      .toDF("tss", "event_type").withColumn("ts", to_timestamp(col("tss")))
    TemporalOps.crossCorrelation(flat, "ts", "event_type",
        "click", "purchase", maxLag = 1)
      .filter(col("xcf").isNotNull).count() shouldBe 0L
  }

  test("seasonalDecompose: constant series has zero seasonal and residual") {
    val df = (0 until 14).map { d =>
      (s"2024-02-${"%02d".format(d + 1)} 10:00:00", 100.0)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val rows = TemporalOps.seasonalDecompose(df, "ts", "v")
      .collect()
    rows.length shouldBe 14
    // interior days: trend = value = 100, seasonal = residual = 0
    val interior = rows.filter(!_.isNullAt(2))
    interior.length shouldBe 8
    interior.foreach { r =>
      r.getAs[Double]("trend") shouldBe 100.0 +- 1e-9
      r.getAs[Double]("seasonal") shouldBe 0.0 +- 1e-9
      r.getAs[Double]("residual") shouldBe 0.0 +- 1e-9
    }
    // edge days carry NULL trend/residual but still get a seasonal
    rows.take(3).foreach(r => r.isNullAt(2) shouldBe true)
  }

  test("seasonalDecompose: value = trend + seasonal + residual identity") {
    val df = (0 until 21).map { d =>
      val dow = d % 7
      (s"2024-02-${"%02d".format(d + 1)} 10:00:00", 100.0 + dow * 10.0)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    TemporalOps.seasonalDecompose(df, "ts", "v")
      .filter(col("residual").isNotNull).collect().foreach { r =>
        val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
          r.getAs[Double]("residual")
        recon shouldBe r.getAs[Double]("value") +- 1e-5
      }
  }

  test("grangerLite: a perfect one-day lead gives r2_full 1 vs tiny r2_r") {
    // x follows an irregular deterministic sequence (so its own lag-1
    // autocorrelation is weak); y = exactly yesterday's x — lag-1 x
    // predicts y perfectly while y's own lag explains little
    def xOf(d: Int): Int = (d * d * 31) % 7 + 1
    val rows = (0 until 20).flatMap { d =>
      val day = f"2024-02-${d + 1}%02d"
      val xs = Seq.fill(xOf(d))((s"$day 09:00:00", "click"))
      val ys = Seq.fill(if (d == 0) 0 else xOf(d - 1))(
        (s"$day 10:00:00", "purchase"))
      xs ++ ys
    }
    val df = rows.toDF("ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TemporalOps.grangerLite(df, "ts", "event_type",
      "click", "purchase").collect()(0)
    r.getAs[Double]("r2_full") shouldBe 1.0 +- 1e-6
    // the restricted fit (y on its own lag) is far from perfect
    r.getAs[Double]("r2_restricted") should be < 0.9
  }

  test("mannKendall: monotone series maxes S; constant series NULLs z") {
    val up = (0 until 8).map { d =>
      (s"2024-04-${"%02d".format(d + 1)} 09:00:00", 10.0 + d)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TemporalOps.mannKendall(up, "ts", "v").collect()(0)
    r.getLong(0) shouldBe 8L
    r.getLong(1) shouldBe 28L // n(n-1)/2, every pair concordant
    r.getString(3) shouldBe "increasing"
    // z = (S-1)/sqrt(n(n-1)(2n+5)/18) with no ties
    val expZ = 27.0 / math.sqrt(8.0 * 7 * 21 / 18.0)
    r.getAs[Double]("z") shouldBe expZ +- 1e-6
    val const = (0 until 5).map { d =>
      (s"2024-04-${"%02d".format(d + 1)} 09:00:00", 7.0)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val rc = TemporalOps.mannKendall(const, "ts", "v").collect()(0)
    rc.getLong(1) shouldBe 0L
    rc.isNullAt(2) shouldBe true
    rc.getString(3) shouldBe "none"
  }

  test("durbinWatson: alternating residuals push DW toward 4, a smooth " +
    "ramp toward 2") {
    // values alternate +/-100 around a flat line → e_t = -e_{t-1}
    // → DW = sum(2e)^2 / sum(e^2) ≈ 4 (edge terms shave a little)
    val alt = (0 until 12).map { d =>
      (s"2024-05-${"%02d".format(d + 1)} 09:00:00",
        if (d % 2 == 0) 200.0 else 0.0)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TemporalOps.durbinWatson(alt, "ts", "v").collect()(0)
    r.getLong(0) shouldBe 12L
    r.getAs[Double]("dw") should be > 3.5
    r.getAs[Double]("rho1") should be < -0.7
    // an exact linear ramp has zero residuals → NULL dw
    val ramp = (0 until 10).map { d =>
      (s"2024-05-${"%02d".format(d + 1)} 09:00:00", 100.0 + 10.0 * d)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val rr = TemporalOps.durbinWatson(ramp, "ts", "v").collect()(0)
    rr.getAs[Double]("slope") shouldBe 10.0 +- 1e-6
    rr.isNullAt(rr.fieldIndex("dw")) shouldBe true
  }
}
