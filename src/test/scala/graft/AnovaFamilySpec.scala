package graft

import graft.ops.{StatsOps, TemporalOps}
import org.apache.spark.sql.functions._

/** The k-group inference family (one-way ANOVA F, Levene's W,
  * Tukey-Kramer HSD, Kruskal-Wallis H, Cochran-Armitage trend,
  * regression-discontinuity readout, mean-shift changepoint) against
  * hand-derived fixtures — textbook-formula values computed from first
  * principles, plus the degenerate-input NULL contracts the oracle
  * fixtures never exercise. */
class AnovaFamilySpec extends SparkSpec {
  import spark.implicits._

  // A: 1,2,3  B: 2,4,6  C: 10,10 → n=8, k=3, SSB=79.5, SSW=10, F=19.875
  private def anovaFixture = Seq(
    ("A", 1.0), ("A", 2.0), ("A", 3.0),
    ("B", 2.0), ("B", 4.0), ("B", 6.0),
    ("C", 10.0), ("C", 10.0)).toDF("g", "v")

  test("anovaF matches the textbook decomposition") {
    val r = StatsOps.anovaF(anovaFixture, "v", "g").collect()(0)
    r.getLong(0) shouldBe 8L
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 79.5 +- 1e-9   // ss_between
    r.getDouble(3) shouldBe 10.0 +- 1e-9   // ss_within
    r.getDouble(4) shouldBe 19.875 +- 1e-6 // f_stat
  }

  test("anovaF: single group and zero within-variance emit NULL F") {
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    StatsOps.anovaF(one, "v", "g").collect()(0).isNullAt(4) shouldBe true
    val const = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0))
      .toDF("g", "v")
    StatsOps.anovaF(const, "v", "g").collect()(0).isNullAt(4) shouldBe true
  }

  test("leveneW matches the F-on-deviations value") {
    val r = StatsOps.leveneW(anovaFixture, "v", "g").collect()(0)
    r.getLong(0) shouldBe 8L
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 1.625 +- 1e-6 // w_stat
  }

  test("tukeyHsd emits every pair once, ordered, with symmetric-scale q") {
    val rows = StatsOps.tukeyHsd(anovaFixture, "v", "g")
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows shouldBe Array(("A", "B"), ("A", "C"), ("B", "C"))
    // MSW = 10/5 = 2 in value units²; q(A,B) = |2-4|/sqrt(2/2·(1/3+1/3))
    val q = StatsOps.tukeyHsd(anovaFixture, "v", "g")
      .filter(col("g_a") === "A" && col("g_b") === "B")
      .collect()(0).getAs[Double]("q_stat")
    q shouldBe (2.0 / math.sqrt(1.0 * (2.0 / 3.0))) +- 1e-6
  }

  test("kruskalWallis matches the tie-corrected hand computation") {
    // A: 1,2,2  B: 2,3,3  C: 5,5 → H=5.361111, H'=5.773504
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 2.0),
      ("B", 2.0), ("B", 3.0), ("B", 3.0),
      ("C", 5.0), ("C", 5.0)).toDF("g", "v")
    val r = StatsOps.kruskalWallis(df, "v", "g").collect()(0)
    r.getLong(0) shouldBe 8L
    r.getLong(1) shouldBe 3L
    // tolerance 1e-4, not 1e-6: the per-group deviation terms round to
    // 4dp by design (the decimal-sum determinism discipline), which on
    // an 8-row fixture is visible at the 5th decimal of H
    r.getDouble(2) shouldBe 5.361111 +- 1e-4
    r.getDouble(3) shouldBe 5.773504 +- 1e-4
  }

  test("kruskalWallis: all-tied input emits NULL tie-adjusted H") {
    val df = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0)).toDF("g", "v")
    val r = StatsOps.kruskalWallis(df, "v", "g").collect()(0)
    r.getDouble(2) shouldBe 0.0 +- 1e-9
    r.isNullAt(3) shouldBe true
  }

  test("cochranArmitage matches the hand-derived trend z") {
    // doses 1/2/3, 5 trials each, successes 1/2/4 → z = 1.90159707
    val rows = Seq.fill(1)((1L, true)) ++ Seq.fill(4)((1L, false)) ++
      Seq.fill(2)((2L, true)) ++ Seq.fill(3)((2L, false)) ++
      Seq.fill(4)((3L, true)) ++ Seq.fill(1)((3L, false))
    val r = StatsOps.cochranArmitage(rows.toDF("w", "s"), "w", "s")
      .collect()(0)
    r.getLong(0) shouldBe 15L
    r.getLong(1) shouldBe 7L
    r.getDouble(2) shouldBe 1.90159707 +- 1e-6
  }

  test("cochranArmitage: all-success and single-dose inputs emit NULL z") {
    val allS = Seq((1L, true), (2L, true)).toDF("w", "s")
    StatsOps.cochranArmitage(allS, "w", "s").collect()(0)
      .isNullAt(2) shouldBe true
    val oneDose = Seq((2L, true), (2L, false)).toDF("w", "s")
    StatsOps.cochranArmitage(oneDose, "w", "s").collect()(0)
      .isNullAt(2) shouldBe true
  }

  test("rddReadout recovers a constructed jump exactly") {
    // left: y = 3 + 1·x (x<0); right: y = 8 + 1·x (x≥0) → effect = 5
    val df = Seq((-2.0, 1.0), (-1.0, 2.0), (0.0, 8.0), (1.0, 9.0),
      (2.0, 10.0)).toDF("x", "y")
    val r = StatsOps.rddReadout(df, "x", "y", cutoff = 0.0, bandwidth = 5.0)
      .collect()(0)
    r.getLong(0) shouldBe 2L // n_left
    r.getLong(1) shouldBe 3L // n_right
    r.getAs[Double]("y_left") shouldBe 3.0 +- 1e-6
    r.getAs[Double]("y_right") shouldBe 8.0 +- 1e-6
    r.getAs[Double]("slope_left") shouldBe 1.0 +- 1e-6
    r.getAs[Double]("slope_right") shouldBe 1.0 +- 1e-6
    r.getAs[Double]("rdd_effect") shouldBe 5.0 +- 1e-6
  }

  test("rddReadout: a degenerate side NULLs its fit and the effect") {
    val df = Seq((-1.0, 2.0), (0.0, 8.0), (1.0, 9.0)).toDF("x", "y")
    val r = StatsOps.rddReadout(df, "x", "y", cutoff = 0.0, bandwidth = 5.0)
      .collect()(0)
    r.isNullAt(r.fieldIndex("y_left")) shouldBe true
    r.isNullAt(r.fieldIndex("rdd_effect")) shouldBe true
    r.getAs[Double]("y_right") shouldBe 8.0 +- 1e-6
  }

  test("kendallTauB matches the hand-counted concordance with ties") {
    // (1,1),(2,2),(3,3),(3,1): C=3, D=1, tie pairs tx=ty=2 of n(n-1)=12
    // → tau_b = 2·2/√(10·10) = 0.4, gamma = 2/4 = 0.5
    val df = Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (3.0, 1L)).toDF("x", "y")
    val r = StatsOps.kendallTauB(df, "x", "y").collect()(0)
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 3L // concordant
    r.getLong(2) shouldBe 1L // discordant
    r.getAs[Double]("tau_b") shouldBe 0.4 +- 1e-9
    r.getAs[Double]("gamma") shouldBe 0.5 +- 1e-9
  }

  test("kendallTauB: perfect order gives tau_b = 1; reversal gives -1") {
    val up = Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)).toDF("x", "y")
    StatsOps.kendallTauB(up, "x", "y").collect()(0)
      .getAs[Double]("tau_b") shouldBe 1.0 +- 1e-9
    val down = Seq((1.0, 3L), (2.0, 2L), (3.0, 1L)).toDF("x", "y")
    StatsOps.kendallTauB(down, "x", "y").collect()(0)
      .getAs[Double]("tau_b") shouldBe -1.0 +- 1e-9
  }

  test("cliffsDelta: balanced overlap is 0, separation is 1 with label") {
    val bal = Seq(("a", 1.0), ("a", 2.0), ("b", 0.0), ("b", 3.0))
      .toDF("g", "v")
    val r0 = StatsOps.cliffsDelta(bal, "v", "g", "a", "b").collect()(0)
    r0.getAs[Double]("cliffs_delta") shouldBe 0.0 +- 1e-9
    r0.getString(3) shouldBe "negligible"
    val sep = Seq(("a", 2.0), ("a", 3.0), ("b", 0.0), ("b", 1.0))
      .toDF("g", "v")
    val r1 = StatsOps.cliffsDelta(sep, "v", "g", "a", "b").collect()(0)
    r1.getAs[Double]("cliffs_delta") shouldBe 1.0 +- 1e-9
    r1.getString(3) shouldBe "large"
  }

  test("friedmanQ matches the textbook value and drops incomplete blocks") {
    // two complete blocks, consistent order 1<2<3 → Q = 4 (perfect
    // consistency at n=2, k=3); a third block missing one treatment is
    // dropped and must not change the statistic
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0),
      ("b3", "t1", 9.0), ("b3", "t2", 8.0)).toDF("blk", "trt", "v")
    val r = StatsOps.friedmanQ(df, "blk", "trt", "v").collect()(0)
    r.getLong(0) shouldBe 2L // n_blocks (b3 dropped)
    r.getLong(1) shouldBe 3L // k
    r.getAs[Double]("q") shouldBe 4.0 +- 1e-9
    r.getAs[Double]("q_tie_adj") shouldBe 4.0 +- 1e-9 // no ties
  }

  test("friedmanQ: a duplicated-treatment block is NOT complete") {
    // block b3 has k=3 ROWS but only 2 distinct treatments (t1 twice,
    // t3 missing) — a row-count-only completeness filter would admit it
    // and skew the within-block ranks; the distinct-count filter drops
    // it, leaving the two clean blocks' statistic untouched
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 1.0), ("b2", "t2", 2.0), ("b2", "t3", 3.0),
      ("b3", "t1", 9.0), ("b3", "t1", 8.0), ("b3", "t2", 7.0))
      .toDF("blk", "trt", "v")
    val r = StatsOps.friedmanQ(df, "blk", "trt", "v").collect()(0)
    r.getLong(0) shouldBe 2L // n_blocks — b3 dropped despite 3 rows
    r.getAs[Double]("q") shouldBe 4.0 +- 1e-9
    // same contract on pageTrend (shared completeness filter)
    val rp = StatsOps.pageTrend(df, "blk", "trt", "v").collect()(0)
    rp.getLong(0) shouldBe 2L
  }

  test("pageTrend: a perfectly ordered fixture maxes L; reversal flips it") {
    // 2 blocks, 3 ordered treatments, values follow the order exactly:
    // R_j = j per block → L = n·Σj² = 28 vs E = n·k(k+1)²/4 = 24
    val up = Seq(("b1", 1L, 1.0), ("b1", 2L, 2.0), ("b1", 3L, 3.0),
      ("b2", 1L, 5.0), ("b2", 2L, 6.0), ("b2", 3L, 7.0))
      .toDF("blk", "trt", "v")
    val r = StatsOps.pageTrend(up, "blk", "trt", "v").collect()(0)
    r.getLong(0) shouldBe 2L
    r.getLong(1) shouldBe 3L
    r.getAs[Double]("l_stat") shouldBe 28.0 +- 1e-9
    r.getString(4) shouldBe "increasing"
    r.getAs[Double]("z") should be > 0.0
    val down = up.withColumn("v", -col("v"))
    val rd = StatsOps.pageTrend(down, "blk", "trt", "v").collect()(0)
    rd.getAs[Double]("l_stat") shouldBe 20.0 +- 1e-9 // n·Σ j·(k+1−j)
    rd.getString(4) shouldBe "decreasing"
  }

  test("logRankTest matches the hand-computed hypergeometric decomposition") {
    // a: (1,ev),(2,ev),(3,cens)  b: (1,cens),(2,ev),(4,ev)
    // t=1: E=0.5 V=0.25; t=2: E=1.0 V=1/3; t=4: n=1 → E=0 V=0
    val df = Seq((1L, true, "a"), (2L, true, "a"), (3L, false, "a"),
      (1L, false, "b"), (2L, true, "b"), (4L, true, "b"))
      .toDF("dur", "ev", "g")
    val r = StatsOps.logRankTest(df, "dur", "ev", "g", "a", "b").collect()(0)
    r.getLong(0) shouldBe 3L      // n_a
    r.getLong(1) shouldBe 3L      // n_b
    r.getLong(2) shouldBe 2L      // observed_a
    r.getAs[Double]("expected_a") shouldBe 1.5 +- 1e-6
    r.getAs[Double]("chi2") shouldBe (0.25 / (0.25 + 1.0 / 3)) +- 1e-6
    r.getAs[Double]("z") shouldBe (0.5 / math.sqrt(0.25 + 1.0 / 3)) +- 1e-6
  }

  test("logRankTest: identical arms give z = 0") {
    val df = Seq((1L, true, "a"), (2L, true, "a"),
      (1L, true, "b"), (2L, true, "b")).toDF("dur", "ev", "g")
    val r = StatsOps.logRankTest(df, "dur", "ev", "g", "a", "b").collect()(0)
    r.getAs[Double]("z") shouldBe 0.0 +- 1e-9
  }

  test("wasserstein1D equals the CDF-area hand computation") {
    // a: 1,2,3  b: 2,3,5 → W1 = 1/3·1 + 1/3·1 + 1/3·2 = 4/3 (= the
    // mean shift here, since the CDFs never cross)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 5.0)).toDF("g", "v")
    val r = StatsOps.wasserstein1D(df, "v", "g", "a", "b").collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 3L
    r.getAs[Double]("w1") shouldBe (4.0 / 3) +- 1e-6
  }

  test("wasserstein1D is zero on identical slices, order-symmetric") {
    val df = Seq(("a", 1.0), ("a", 7.0), ("b", 1.0), ("b", 7.0))
      .toDF("g", "v")
    StatsOps.wasserstein1D(df, "v", "g", "a", "b").collect()(0)
      .getAs[Double]("w1") shouldBe 0.0 +- 1e-9
    val sk = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0), ("b", 5.0))
      .toDF("g", "v")
    val ab = StatsOps.wasserstein1D(sk, "v", "g", "a", "b")
      .collect()(0).getAs[Double]("w1")
    val ba = StatsOps.wasserstein1D(sk, "v", "g", "b", "a")
      .collect()(0).getAs[Double]("w1")
    ab shouldBe ba +- 1e-9
    ab shouldBe 3.0 +- 1e-6 // both points shift by 3
  }

  test("cramerVonMises: zero on identical slices, hand value on a shift") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    StatsOps.cramerVonMises(same, "v", "g", "a", "b").collect()(0)
      .getAs[Double]("t_stat") shouldBe 0.0 +- 1e-9
    // a: {1,2}, b: {3,4} — gaps at pooled points: 1/2, 1, 1/2, 0
    // T = (2·2/16)·(2·(1/4) + 2·1 + 2·(1/4) + 0)... per-point with
    // multiplicity t=1 each: Σ = 1/4 + ... compute directly:
    // F_a = .5,1,1,1; F_b = 0,0,.5,1 → gaps² = .25,1,.25,0 → Σ=1.5
    // T = (4/16)·1.5 = 0.375
    val shift = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    StatsOps.cramerVonMises(shift, "v", "g", "a", "b").collect()(0)
      .getAs[Double]("t_stat") shouldBe 0.375 +- 1e-6
  }

  test("pettittTest finds the rank changepoint with the exact integer U") {
    // days 1-5 low (10,11,12,11,10), days 6-10 high (50,51,52,51,50):
    // doubled ranks 3,7,10,7,3,13,17,20,17,13 → K = |U_5| = 25 at day 5
    val vals = Seq(10.0, 11.0, 12.0, 11.0, 10.0,
      50.0, 51.0, 52.0, 51.0, 50.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (s"2024-03-${"%02d".format(i + 1)} 09:00:00", v)
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TemporalOps.pettittTest(df, "ts", "v").collect()(0)
    r.getTimestamp(0).toString should startWith("2024-03-05")
    r.getLong(1) shouldBe 10L
    r.getLong(2) shouldBe 25L
    r.getAs[Double]("p_approx") shouldBe
      math.min(1.0, 2.0 * math.exp(-6.0 * 25 * 25 / 1100.0)) +- 1e-6
  }

  test("changepointMean finds a constructed level shift at the right day") {
    val df = (0 until 10).flatMap { d =>
      val base = if (d < 6) 10.0 else 50.0
      Seq((s"2024-01-${"%02d".format(d + 1)} 12:00:00", base),
        (s"2024-01-${"%02d".format(d + 1)} 13:00:00", base + 2.0))
    }.toDF("ts_s", "v").withColumn("ts", col("ts_s").cast("timestamp"))
    val r = TemporalOps.changepointMean(df, "ts", "v").collect()(0)
    r.getTimestamp(0).toString should startWith("2024-01-06")
    r.getLong(1) shouldBe 12L // n_left
    r.getLong(2) shouldBe 8L  // n_right
    r.getAs[Double]("mean_left") shouldBe 11.0 +- 1e-6
    r.getAs[Double]("mean_right") shouldBe 51.0 +- 1e-6
  }
}
