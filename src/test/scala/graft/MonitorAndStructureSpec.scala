package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, TemporalOps}
import graft.ext.TextOps

/** sprtMonitor, degreeAssortativity, wordBurstiness. */
class MonitorAndStructureSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, i: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:${i % 60}%02d")

  test("sprtMonitor: an H1-rate stream crosses the upper bound and stays") {
    // 40 trials/day at 50% success under H0 10% vs H1 50%: the LLR climbs
    // fast — decision reaches accept_h1 and the cumulative form never
    // un-decides on this stream
    val rows = for (d <- 1 to 5; i <- 0 until 40)
      yield (ts(d, i), i % 2 == 0)
    val got = TemporalOps.sprtMonitor(rows.toDF("t", "ok"), "t", "ok",
        p0 = 0.1, p1 = 0.5)
      .orderBy("day").collect()
    got.length shouldBe 5
    got.head.getAs[Long]("n") shouldBe 40L
    got.head.getAs[Long]("k") shouldBe 20L
    got.head.getAs[String]("decision") shouldBe "accept_h1"
    got.last.getAs[Long]("n") shouldBe 200L
    // llr matches the closed form on exact integer counts
    val expect = BigDecimal(20 * math.log(0.5 / 0.1) +
      20 * math.log(0.5 / 0.9)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    got.head.getAs[Double]("llr") shouldBe expect
  }

  test("sprtMonitor: an H0-rate stream crosses the lower bound") {
    // 0 successes in 100 trials under H0 10% vs H1 50%
    val rows = for (d <- 1 to 2; i <- 0 until 50)
      yield (ts(d, i), false)
    val got = TemporalOps.sprtMonitor(rows.toDF("t", "ok"), "t", "ok",
        p0 = 0.1, p1 = 0.5)
      .orderBy("day").collect()
    got.last.getAs[String]("decision") shouldBe "accept_h0"
    got.last.getAs[Double]("llr") should be < 0.0
  }

  test("sprtMonitor: an on-the-fence stream keeps monitoring") {
    // exactly the geometric mean of the hypotheses' likelihoods would sit
    // at 0; a tiny sample at an in-between rate stays 'continue'
    val rows = (0 until 10).map(i => (ts(1, i), i < 3))
    val got = TemporalOps.sprtMonitor(rows.toDF("t", "ok"), "t", "ok",
        p0 = 0.1, p1 = 0.5)
      .collect()
    got.head.getAs[String]("decision") shouldBe "continue"
  }

  test("degreeAssortativity: a star is perfectly disassortative") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "t")
    val r = GraphOps.degreeAssortativity(edges, "s", "t").head()
    r.getAs[Long]("n_nodes") shouldBe 4L
    r.getAs[Long]("n_edges") shouldBe 3L
    r.getAs[Double]("assortativity") shouldBe -1.0
  }

  test("adamicAdar: square-with-diagonal matches the hand computation") {
    // edges (1,2),(2,3),(3,4),(4,1),(1,3): the only NON-adjacent
    // distance-2 pair is (2,4), via centers 1 and 3 (degree 3 each) —
    // aa = 2·round(1/ln 3, 6); (1,3) is an edge, so it must NOT appear
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("s", "t")
    val out = GraphOps.adamicAdar(edges, "s", "t")
      .orderBy("u", "v").collect()
    out.length shouldBe 1
    val r = out.head
    (r.getAs[Long]("u"), r.getAs[Long]("v")) shouldBe ((2L, 4L))
    r.getAs[Long]("n_common") shouldBe 2L
    val term = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    r.getAs[Double]("aa_score") shouldBe (term * 2).toDouble
  }

  test("adamicAdar: the hub cap drops hub-centered wedges, never invents pairs") {
    // same square-with-diagonal; maxCenterDegree=2 excludes both
    // degree-3 centers → (2,4) loses its only evidence and vanishes
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("s", "t")
    GraphOps.adamicAdar(edges, "s", "t", maxCenterDegree = 2)
      .count() shouldBe 0L
    // a path a-b-c keeps its degree-2 center: (a,c) via b, aa = 1/ln 2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "t")
    val r = GraphOps.adamicAdar(path, "s", "t", maxCenterDegree = 2).head()
    (r.getAs[Long]("u"), r.getAs[Long]("v")) shouldBe ((1L, 3L))
    r.getAs[Double]("aa_score") shouldBe
      BigDecimal(1.0 / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("clusteringCoefficients: square-with-diagonal, by hand") {
    // triangles (1,2,3) and (1,3,4); deg 1,3 = 3 and 2,4 = 2 →
    // coeff(1) = coeff(3) = 2·2/(3·2) = 2/3; coeff(2) = coeff(4) = 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("s", "t")
    val out = GraphOps.clusteringCoefficients(edges, "s", "t")
      .orderBy("node").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg"),
        r.getAs[Long]("n_triangles"), r.getAs[Double]("clustering_coeff")))
    out shouldBe Array(
      (1L, 3L, 2L, 0.666667), (2L, 2L, 1L, 1.0),
      (3L, 3L, 2L, 0.666667), (4L, 2L, 1L, 1.0))
    // a triangle-free path: the degree-2 center scores 0.0, leaves
    // (deg 1) are excluded — the undefined-denominator contract
    val path = GraphOps.clusteringCoefficients(
      Seq((1L, 2L), (2L, 3L)).toDF("s", "t"), "s", "t").collect()
    path.map(r => (r.getAs[Long]("node"),
      r.getAs[Double]("clustering_coeff"))) shouldBe Array((2L, 0.0))
  }

  test("degreeAssortativity: regular graphs have no degree variance → null") {
    // triangle: every degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val r = GraphOps.degreeAssortativity(edges, "s", "t").head()
    r.isNullAt(r.fieldIndex("assortativity")) shouldBe true
  }

  test("degreeAssortativity: degree-homogeneous components score 1") {
    // K3 ∪ K2: every edge joins equal-degree endpoints, but degree
    // VARIES across the graph (2 vs 1) — perfectly assortative
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)).toDF("s", "t")
    val r = GraphOps.degreeAssortativity(edges, "s", "t").head()
    r.getAs[Long]("n_edges") shouldBe 4L
    r.getAs[Double]("assortativity") shouldBe 1.0
  }

  test("degreeAssortativity: bridged cliques match the hand computation") {
    // K4 + K4 bridged at (0, 10): bridge endpoints have degree 4, their
    // other edges attach to degree-3 clique-mates → mildly
    // disassortative; moments by hand: m=26, num=−12, dx=dy=144
    def k4(off: Long) = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (off + i, off + j)
    val edges = (k4(0) ++ k4(10) :+ (0L, 10L)).toDF("s", "t")
    val r = GraphOps.degreeAssortativity(edges, "s", "t").head()
    r.getAs[Long]("n_edges") shouldBe 13L
    r.getAs[Double]("assortativity") shouldBe
      BigDecimal(-12.0 / 144.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("streamingSprtMonitor final readout equals the batch op (parity)") {
    import graft.streaming.StreamingPipeline
    val work = java.nio.file.Files
      .createTempDirectory("graft_sprt_").toString
    // two keys with opposite rates: 'click' runs hot (H1-ish), 'view'
    // runs cold (H0-ish) — delivered across several source files so the
    // cumulative state crosses micro-batches
    val rows = (for (d <- 1 to 4; i <- 0 until 30) yield {
      val hot = i % 2 == 0
      (d * 1000L + i, ts(d, i), i.toLong, if (hot) "click" else "view",
        if (i % (if (hot) 2 else 10) == 0) 1.0 else 0.0, "{}")
    })
    val ev = rows.toDF(
      StreamingPipeline.eventSchema.fieldNames.toIndexedSeq: _*)
    ev.write.mode("overwrite").parquet(s"$work/src")

    val q = StreamingPipeline.streamingSprtMonitor(
        StreamingPipeline.readEventStream(spark, s"$work/src"),
        p0 = 0.1, p1 = 0.5)(_.value > 0.5)
      .writeStream.format("memory").queryName("graft_sprt")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // latest streaming readout per key = the row with the max n
    val streamed = spark.table("graft_sprt")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("n").desc)))
      .filter(col("rn") === 1)
      .select("key", "n", "k", "llr", "decision")
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap

    for (key <- Seq("click", "view")) {
      val batchLast = TemporalOps.sprtMonitor(
          ev.filter(col("event_type") === key)
            .select(col("ts").as("t"), (col("value") > 0.5).as("ok")),
          "t", "ok", p0 = 0.1, p1 = 0.5)
        .orderBy(col("day").desc).limit(1).collect().head
      val s = streamed(key)
      withClue(s"key $key: ") {
        s._2 shouldBe batchLast.getAs[Long]("n")
        s._3 shouldBe batchLast.getAs[Long]("k")
        s._4 shouldBe batchLast.getAs[Double]("llr")
        s._5 shouldBe batchLast.getAs[String]("decision")
      }
    }
    // and the two keys actually decide differently on this stream
    streamed("click")._5 shouldBe "accept_h1"
    streamed("view")._5 shouldBe "accept_h0"
  }

  test("mutualBestMatch: the hub cannot absorb its whole block") {
    import graft.ext.DedupOps
    // A's best is B and vice versa; C's best is A, but A prefers B — so
    // (A,C) dies and C stays unmatched rather than chaining onto the hub
    val pairs = Seq(("A", "B", 0.9), ("A", "C", 0.8), ("B", "C", 0.7))
      .toDF("x", "y", "s")
    val got = DedupOps.mutualBestMatch(pairs, "x", "y", "s")
      .as[(String, String, Double)].collect()
    got shouldBe Array(("A", "B", 0.9))
  }

  test("mutualBestMatch: score ties break to the smaller counterpart") {
    import graft.ext.DedupOps
    val pairs = Seq(("A", "C", 0.9), ("A", "B", 0.9)).toDF("x", "y", "s")
    val got = DedupOps.mutualBestMatch(pairs, "x", "y", "s")
      .as[(String, String, Double)].collect()
    // A's best ties → B (smaller); B's best is A; C loses its only edge
    got shouldBe Array(("A", "B", 0.9))
  }

  test("clampedBalance: the non-associative fold clamps at both bounds") {
    import graft.ops.TemporalOps
    // key 1: +80 → clamp hi (100); +30 absorbed; −150 → clamp lo (0);
    // +20 → 20. Unclamped prefix sum would say −20: the clamp changed
    // HISTORY, which is exactly why no window can express this.
    val rows = Seq(
      (1L, 1L, 1L, 80L), (1L, 2L, 1L, 30L), (1L, 3L, 1L, -150L),
      (1L, 4L, 1L, 20L),
      // key 2: ordering matters — tie on ord broken by tie col
      (2L, 1L, 2L, -50L), (2L, 1L, 1L, 120L))
    val got = TemporalOps.clampedBalance(rows.toDF("k", "o", "t", "d"),
        "k", "o", "t", "d", lo = 0L, hi = 100L)
      .orderBy("k").as[(Long, Long, Long, Long, Long)].collect()
    got(0) shouldBe ((1L, 4L, 20L, 1L, 1L))
    // key 2: +120 → clamp hi (100), then −50 → 50 (reverse order would
    // give clamp-lo then 100)
    got(1) shouldBe ((2L, 2L, 50L, 1L, 0L))
  }

  test("streamingClampedBalance final readout equals the batch fold") {
    import graft.streaming.StreamingPipeline
    import graft.ops.TemporalOps
    val work = java.nio.file.Files
      .createTempDirectory("graft_bal_").toString
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map { i =>
      (i.toLong, ts(1 + i % 20, i), (i % 7).toLong, "purchase",
        (rnd.nextInt(300) - 100).toDouble, "{}")
    }
    val ev = rows.toDF(
      StreamingPipeline.eventSchema.fieldNames.toIndexedSeq: _*)
    ev.write.mode("overwrite").parquet(s"$work/src")

    val q = StreamingPipeline.streamingClampedBalance(
        StreamingPipeline.readEventStream(spark, s"$work/src"),
        lo = 0L, hi = 150L)(e => e.value.toLong)
      .writeStream.format("memory").queryName("graft_bal")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("graft_bal")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("n_events").desc)))
      .filter(col("rn") === 1)
      .select("key", "n_events", "final_balance", "n_clamped_hi",
        "n_clamped_lo")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val batch = TemporalOps.clampedBalance(
        ev.select(col("user_id"), unix_timestamp(col("ts")).as("o"),
          col("event_id"), col("value").cast("long").as("delta")),
        "user_id", "o", "event_id", "delta", lo = 0L, hi = 150L)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect()

    streamed shouldBe batch
    // and the bounds actually bit on this stream
    batch.map(_._4).sum should be > 0L
    batch.map(_._5).sum should be > 0L
  }

  test("streamingClampedBalance parity: same-second events where millis " +
    "order disagrees with event_id order") {
    import graft.streaming.StreamingPipeline
    import graft.ops.TemporalOps
    // Both events land in the SAME floored second, but millisecond order
    // (id 2 at .100 before id 1 at .900) disagrees with event_id order.
    // The clamp fold is non-associative: id-order gives +120→clamp hi 100,
    // −50→50; millis-order gives −50→clamp lo 0, +120→clamp hi 100. The
    // batch op folds in (unix_timestamp, event_id) order, so the stream
    // must too — a raw-millis sort would diverge exactly here.
    val base = java.sql.Timestamp.valueOf("2024-03-01 10:00:00").getTime
    val work = java.nio.file.Files
      .createTempDirectory("graft_bal_tie_").toString
    val rows = Seq(
      (1L, new java.sql.Timestamp(base + 900), 7L, "purchase", 120.0, "{}"),
      (2L, new java.sql.Timestamp(base + 100), 7L, "purchase", -50.0, "{}"))
    val ev = rows.toDF(
      StreamingPipeline.eventSchema.fieldNames.toIndexedSeq: _*)
    ev.write.mode("overwrite").parquet(s"$work/src")

    val q = StreamingPipeline.streamingClampedBalance(
        StreamingPipeline.readEventStream(spark, s"$work/src"),
        lo = 0L, hi = 100L)(e => e.value.toLong)
      .writeStream.format("memory").queryName("graft_bal_tie")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("graft_bal_tie")
      .select("key", "n_events", "final_balance", "n_clamped_hi",
        "n_clamped_lo")
      .as[(Long, Long, Long, Long, Long)].collect()
    streamed shouldBe Array((7L, 2L, 50L, 1L, 0L))

    val batch = TemporalOps.clampedBalance(
        ev.select(col("user_id"), unix_timestamp(col("ts")).as("o"),
          col("event_id"), col("value").cast("long").as("delta")),
        "user_id", "o", "event_id", "delta", lo = 0L, hi = 100L)
      .as[(Long, Long, Long, Long, Long)].collect()
    streamed shouldBe batch
  }

  test("maseReport: an exact weekly cycle scores mase 0") {
    // counts cycle with period 7 → the seasonal-naive forecast is exact
    val rows = for (d <- 0 until 28; i <- 0 until (1 + d % 7))
      yield Tuple1(Timestamp.valueOf(
        f"2024-01-${d + 1}%02d 00:00:${i % 60}%02d"))
    val r = graft.ops.TemporalOps.maseReport(rows.toDF("t"), "t",
      season = 7).head()
    r.getAs[Long]("n_days") shouldBe 21L
    r.getAs[Double]("mae_seasonal") shouldBe 0.0
    r.getAs[Double]("mase") shouldBe 0.0
    // the naive baseline is NOT exact on a sawtooth
    r.getAs[Double]("mae_naive") should be > 0.0
  }

  test("SkipGramPairs kernel matches the positional reference; window=1 = bigrams") {
    import org.apache.spark.unsafe.types.UTF8String
    def kernel(s: String, w: Int): Seq[String] =
      graft.functions.SkipGramPairs.kernel(UTF8String.fromString(s), w)
        .toSeq[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString)
    def ref(s: String, w: Int): Seq[String] = {
      val t = s.split(" ", -1)
      for {
        i <- t.indices
        j <- (i + 1) to math.min(t.length - 1, i + w)
      } yield s"${t(i)} ${t(j)}"
    }
    val rnd = new scala.util.Random(99)
    def sentence() = Seq.fill(rnd.nextInt(12))(
      ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(2)))
      .mkString(" ")
    for (_ <- 1 to 300; w <- Seq(1, 2, 3)) {
      val s = sentence()
      kernel(s, w) shouldBe ref(s, w)
    }
    // window=1 degenerates to adjacent bigrams (the WordGrams(2) set)
    val s = "x y z x y"
    kernel(s, 1) shouldBe Seq("x y", "y z", "z x", "x y")
  }

  test("conformalInterval: q-hat is the exact rank statistic; coverage holds") {
    import graft.ops.StatsOps
    // one group, cents 0..999 spread over splits by value mod 5 — the
    // residual distribution is identical across splits, so held-out
    // coverage must land within sampling noise of the 90% target
    val rows = (0 until 1000).map(i => ("g", i.toLong * 10, (i % 5).toLong))
    val r = StatsOps.conformalInterval(rows.toDF("grp", "cents", "split"),
      "grp", "cents", "split", Seq(0L, 1L, 2L), 3L, 4L).head()
    val nCal = r.getAs[Long]("n_cal")
    nCal shouldBe 200L
    r.getAs[Long]("k_rank") shouldBe ((nCal + 1) * 9 + 9) / 10
    r.getAs[Double]("target") shouldBe 0.9
    r.getAs[Double]("coverage") should be >= 0.85
    r.getAs[Double]("coverage") should be <= 0.95
    // q̂ is a real calibration residual magnitude, not an interpolation
    (r.getAs[Long]("q_hat_cents") % 1 == 0) shouldBe true
  }

  test("conformalInterval: k > n clamps q-hat to the max residual") {
    import graft.ops.StatsOps
    // 4 calibration rows: k = ceil(5·0.9) = 5 > 4 → q̂ = max residual
    val rows = Seq(("g", 0L, 0L), ("g", 100L, 0L),
      ("g", 0L, 3L), ("g", 10L, 3L), ("g", 90L, 3L), ("g", 100L, 3L),
      ("g", 50L, 4L))
    val r = StatsOps.conformalInterval(rows.toDF("grp", "cents", "split"),
      "grp", "cents", "split", Seq(0L), 3L, 4L).head()
    r.getAs[Long]("n_cal") shouldBe 4L
    r.getAs[Long]("k_rank") shouldBe 5L
    // train mean = 50 → cal residuals {50, 40, 40, 50} → max 50
    r.getAs[Long]("q_hat_cents") shouldBe 50L
    r.getAs[Double]("coverage") shouldBe 1.0  // |50-50| = 0 ≤ 50
  }

  test("isotonicCalibration pools adjacent violators exactly (PAV)") {
    import graft.ops.EvalOps
    // bins 0/1/2 rates 0.1 / 0.5 / 0.3 with equal mass: PAV pools bins
    // 1 and 2 to (0.5+0.3)/2 = 0.4; bin 0 stays. Scores placed at bin
    // centers of a 10-bin grid via p = (bin + 0.5)/10, but only bins
    // 0..2 populated.
    def rows(bin: Int, k: Int, n: Int) = (1 to n).map(i =>
      ((bin + 0.5) / 10.0, i <= k))
    val df = (rows(0, 1, 10) ++ rows(1, 5, 10) ++ rows(2, 3, 10))
      .toDF("p", "y")
    val got = EvalOps.isotonicCalibration(df, "p", "y", bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Double, Double)].collect()
    got.map(_._5) shouldBe Array(0.1, 0.4, 0.4)
    // already-monotone input is returned unchanged
    val mono = (rows(0, 1, 10) ++ rows(1, 3, 10) ++ rows(2, 7, 10))
      .toDF("p", "y")
    EvalOps.isotonicCalibration(mono, "p", "y", bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Double, Double)].collect()
      .map(_._5) shouldBe Array(0.1, 0.3, 0.7)
  }

  test("isotonicCalibration output is monotone on random inputs") {
    import graft.ops.EvalOps
    val rnd = new scala.util.Random(5)
    val df = (1 to 2000).map(_ =>
      (rnd.nextDouble(), rnd.nextDouble() < 0.3)).toDF("p", "y")
    val cal = EvalOps.isotonicCalibration(df, "p", "y", bins = 10)
      .orderBy("bin").select("calibrated").as[Double].collect()
    cal.sliding(2).foreach { w =>
      if (w.length == 2) w(1) should be >= w(0)
    }
  }

  test("averageOverlap: identity → 1, disjoint → 0, brute force agrees") {
    import graft.ops.EvalOps
    def lst(ids: Seq[String]) =
      ids.zipWithIndex.map { case (w, i) => (w, i + 1) }.toDF("id", "rank")
    val a = lst(Seq("w", "x", "y", "z"))
    EvalOps.averageOverlap(a, lst(Seq("w", "x", "y", "z")), "id", "rank", 4)
      .head().getAs[Double]("avg_overlap") shouldBe 1.0
    EvalOps.averageOverlap(a, lst(Seq("p", "q", "r", "s")), "id", "rank", 4)
      .head().getAs[Double]("avg_overlap") shouldBe 0.0
    // brute force: AO = (1/D)·Σ_d |A_d ∩ B_d|/d on the reversed list
    val b = Seq("z", "y", "x", "w")
    val ao = (1 to 4).map { d =>
      Seq("w", "x", "y", "z").take(d).toSet
        .intersect(b.take(d).toSet).size.toDouble / d
    }.sum / 4
    val got = EvalOps.averageOverlap(a, lst(b), "id", "rank", 4)
      .head().getAs[Double]("avg_overlap")
    got shouldBe (ao +- 1e-6)
  }

  test("wordBurstiness: bursty words outrank even spreaders; minDf gates") {
    val docs = Seq(
      (1L, "the spam spam spam"),
      (2L, "the spam spam spam"),
      (3L, "the rare"),
      (4L, "the unique unique unique unique")) // df=1 → gated at minDf=2
    val got = TextOps.wordBurstiness(docs.toDF("id", "text"), "id", "text",
        minDf = 2L, k = 10)
      .as[(String, Long, Long, Double)].collect()
    got.map(_._1) shouldBe Array("spam", "the")
    got(0) shouldBe (("spam", 6L, 2L, 3.0))
    got(1) shouldBe (("the", 4L, 4L, 1.0))
  }
}
