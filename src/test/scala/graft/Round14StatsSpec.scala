package graft

import graft.ops.{EvalOps, StatsOps, TemporalOps}
import org.apache.spark.sql.functions._

/**
 * Hand-computed fixtures for the round-14 statistics wave — every
 * operator enters with (a) an oracle entry, (b) a brute-force/
 * hand-value property spec here, (c) a plan-gate classification in
 * [[graft.plans.PlanAudit]] (the round-13 three-part discipline).
 */
class Round14StatsSpec extends SparkSpec {
  private val s2 = spark
  import s2.implicits._

  test("somersD: hand-counted asymmetric concordance with response ties") {
    // (x,y): (1,1),(2,1),(3,2) — pairs: (1,2) ties y; (1,3),(2,3)
    // concordant. C=2, D=0; x untied everywhere (d1 = 6), y tie mass
    // 2 (d2 = 4) → D_y|x = 4/6, D_x|y = 1
    val df = Seq((1, 1), (2, 1), (3, 2)).toDF("x", "y")
    val r = StatsOps.somersD(df, "x", "y").collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L // concordant
    r.getLong(2) shouldBe 0L // discordant
    r.getAs[Double]("d_y_given_x") shouldBe (2.0 / 3) +- 1e-8
    r.getAs[Double]("d_x_given_y") shouldBe 1.0 +- 1e-9
  }

  test("somersD squares to kendall tau-b (tau_b^2 = D_yx * D_xy)") {
    val df = Seq((1, 2), (2, 1), (2, 3), (3, 3), (4, 2), (5, 5))
      .toDF("x", "y")
    val d = StatsOps.somersD(df, "x", "y").collect()(0)
    val t = StatsOps.kendallTauB(df, "x", "y").collect()(0)
    val tau = t.getAs[Double]("tau_b")
    (d.getAs[Double]("d_y_given_x") * d.getAs[Double]("d_x_given_y")) shouldBe
      (tau * tau) +- 1e-6
  }

  test("gkLambda: dependence without prediction gain scores 0 in that direction") {
    // rows: r1 always c1 (10), r2 split 5/5 — knowing the row never
    // changes the modal column guess (c1), so lambda_b|a = 0, while
    // the reverse direction gains: lambda_a|b = 0.5
    val rows = Seq.fill(10)(("r1", "c1")) ++
      Seq.fill(5)(("r2", "c1")) ++ Seq.fill(5)(("r2", "c2"))
    val r = StatsOps.gkLambda(rows.toDF("a", "b"), "a", "b").collect()(0)
    r.getLong(0) shouldBe 20L
    r.getAs[Double]("lambda_b_given_a") shouldBe 0.0 +- 1e-9
    r.getAs[Double]("lambda_a_given_b") shouldBe 0.5 +- 1e-9
  }

  test("theilsU: 1 on perfect dependence, 0 on exact independence") {
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("p", "q")
    val r1 = StatsOps.theilsU(dep, "p", "q").collect()(0)
    r1.getAs[Double]("h_a") shouldBe math.log(2) +- 1e-5
    r1.getAs[Double]("u_b_given_a") shouldBe 1.0 +- 1e-5
    r1.getAs[Double]("u_a_given_b") shouldBe 1.0 +- 1e-5
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("p", "q")
    val r2 = StatsOps.theilsU(ind, "p", "q").collect()(0)
    r2.getAs[Double]("mi") shouldBe 0.0 +- 1e-9
    r2.getAs[Double]("u_b_given_a") shouldBe 0.0 +- 1e-9
  }

  test("kendallW: perfectly consistent blocks give W = 1") {
    // two blocks ranking three treatments identically → friedman Q = 4
    // at m=2, k=3 and W = Q/(m(k-1)) = 1
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 4.0), ("b2", "t2", 5.0), ("b2", "t3", 6.0))
      .toDF("blk", "trt", "v")
    val r = StatsOps.kendallW(df, "blk", "trt", "v").collect()(0)
    r.getLong(0) shouldBe 2L
    r.getAs[Double]("w") shouldBe 1.0 +- 1e-8
    r.getAs[Double]("w_tie_adj") shouldBe 1.0 +- 1e-8
  }

  test("cochranQ matches the hand computation; absent cells are failures") {
    // blocks x treatments (t1,t2,t3): b1=(1,1,0) b2=(1,0,0) b3=(1,1,0)
    // b4=(1,0,1) → C=(4,2,1), N=7, sumC2=21, sumR2=13,
    // Q = 2*(3*21-49)/(3*7-13) = 28/8 = 3.5. b2/b4's missing flags are
    // encoded by ABSENT rows — the dense-fill-as-failure contract.
    val df = Seq(("b1", "t1"), ("b1", "t2"), ("b2", "t1"), ("b3", "t1"),
      ("b3", "t2"), ("b4", "t1"), ("b4", "t3"))
      .toDF("blk", "trt").withColumn("f", lit(true))
      // a failure OBSERVATION must count the same as an absent cell
      .union(Seq(("b2", "t2")).toDF("blk", "trt")
        .withColumn("f", lit(false)))
    val r = StatsOps.cochranQ(df, "blk", "trt", "f").collect()(0)
    r.getLong(0) shouldBe 4L // n_blocks (b2 now has an explicit cell)
    r.getLong(1) shouldBe 3L // k
    r.getLong(2) shouldBe 7L // n_success
    r.getAs[Double]("q") shouldBe 3.5 +- 1e-9
  }

  test("fleissKappa: textbook two-item panel, off-count items dropped") {
    // item1: AA (full agreement), item2: AB → P̄ = 0.5; p_A = 3/4,
    // p_B = 1/4 → Pe = 0.625; κ = (0.5-0.625)/0.375 = -1/3.
    // item3 has 3 ratings (≠ m=2) and must be dropped.
    val df = Seq(("i1", "A"), ("i1", "A"), ("i2", "A"), ("i2", "B"),
      ("i3", "A"), ("i3", "A"), ("i3", "B")).toDF("item", "cat")
    val r = StatsOps.fleissKappa(df, "item", "cat", m = 2).collect()(0)
    r.getLong(0) shouldBe 2L // n_items
    r.getAs[Double]("p_bar") shouldBe 0.5 +- 1e-9
    r.getAs[Double]("p_e") shouldBe 0.625 +- 1e-9
    r.getAs[Double]("kappa") shouldBe (-1.0 / 3) +- 1e-6
  }

  test("rmst: hand-computed step areas incl. leading and clamped segments") {
    // units: (2, event), (4, censored). KM: S(2)=0.5, flat after.
    // tau=5: [0,2)*1 + [2,4)*0.5 + [4,5)*0.5 = 2 + 1 + 0.5 = 3.5
    val df = Seq((2L, true), (4L, false)).toDF("dur", "ev")
    val r = StatsOps.rmst(df, "dur", "ev", tau = 5L).collect()(0)
    r.getLong(0) shouldBe 5L
    r.getLong(1) shouldBe 2L
    r.getAs[Double]("rmst") shouldBe 3.5 +- 1e-8
    // tau inside the first segment: pure leading area
    StatsOps.rmst(df, "dur", "ev", tau = 1L).collect()(0)
      .getAs[Double]("rmst") shouldBe 1.0 +- 1e-9
  }

  test("cumulativeIncidence: hand AJ chain; causes partition the failures") {
    // (1,a) (2,b) (3,censored) (4,a):
    // CIF_a(1)=1*1/4=0.25; S(1)=0.75 → CIF_b(2)=0.75/3=0.25;
    // S(2)=0.5, t=3 censors; CIF_a(4)=0.25+0.5*1/1=0.75
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("a"))).toDF("dur", "cause")
    val rows = StatsOps.cumulativeIncidence(df, "dur", "cause")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Double]("cif")))
    rows.length shouldBe 3
    rows(0) shouldBe ((1L, "a", 0.25))
    rows(1)._3 shouldBe 0.25 +- 1e-8
    rows(2)._1 shouldBe 4L
    rows(2)._3 shouldBe 0.75 +- 1e-8
  }

  test("theilIndex: equal within-group values put ALL inequality between") {
    // A: two rows of 1.00; B: two rows of 2.00 → T_g = 0 both;
    // between = (1/3)ln(2/3) + (2/3)ln(4/3)
    val df = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val r = StatsOps.theilIndex(df, "g", "v").collect()(0)
    r.getAs[Double]("theil_within") shouldBe 0.0 +- 1e-8
    val expected = (1.0 / 3) * math.log(2.0 / 3) +
      (2.0 / 3) * math.log(4.0 / 3)
    r.getAs[Double]("theil_between") shouldBe expected +- 1e-6
    r.getAs[Double]("theil_total") shouldBe expected +- 1e-6
  }

  test("atkinsonIndex: 0 on equality; 1 - geomean/mean on a known pair") {
    val eq = Seq(("g", 5.0), ("g", 5.0)).toDF("k", "v")
    StatsOps.atkinsonIndex(eq, "k", "v").collect()(0)
      .getAs[Double]("atkinson") shouldBe 0.0 +- 1e-8
    // values 1.00 and 4.00: mean 2.50, geomean 2.00 → A = 0.2
    val pr = Seq(("g", 1.0), ("g", 4.0)).toDF("k", "v")
    val r = StatsOps.atkinsonIndex(pr, "k", "v").collect()(0)
    r.getAs[Double]("mean") shouldBe 2.5 +- 1e-9
    r.getAs[Double]("atkinson") shouldBe 0.2 +- 1e-6
  }

  test("brierDecomposition: hand Murphy terms on a two-bin panel") {
    // bin 0.2: 4 rows 1 positive; bin 0.8: 4 rows 3 positives →
    // REL = 0.0025, RES = 0.0625, UNC = 0.25, brier = 0.19
    val df = (Seq.fill(3)((0.2, false)) ++ Seq((0.2, true)) ++
      Seq.fill(3)((0.8, true)) ++ Seq((0.8, false))).toDF("p", "y")
    val r = EvalOps.brierDecomposition(df, "p", "y", bins = 10).collect()(0)
    r.getLong(0) shouldBe 8L
    r.getAs[Double]("base_rate") shouldBe 0.5 +- 1e-9
    r.getAs[Double]("reliability") shouldBe 0.0025 +- 1e-8
    r.getAs[Double]("resolution") shouldBe 0.0625 +- 1e-8
    r.getAs[Double]("uncertainty") shouldBe 0.25 +- 1e-9
    r.getAs[Double]("brier_binned") shouldBe 0.19 +- 1e-8
  }

  // shared tiny daily series: one row per (day, multiplicity)
  private def eventsOn(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((java.sql.Timestamp.valueOf(
        f"2024-01-${i + 1}%02d 12:00:00"), 1L))
    }.toDF("ts", "one")

  test("ljungBox equals the hand-composed sum over acf's own output") {
    val df = eventsOn(Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3))
    val a = TemporalOps.acf(df, "ts", 3).collect()
    val n = a.map(r => r.getLong(0) + r.getLong(1)).head
    val expected = BigDecimal(n) * (n + 2) * a.map { r =>
      val rho = r.getAs[Double]("acf")
      BigDecimal((rho * rho / r.getLong(1) * 1e8).round) / BigDecimal(1e8)
    }.sum
    val lb = TemporalOps.ljungBox(df, "ts", 3).collect()(0)
    lb.getLong(0) shouldBe n
    lb.getLong(1) shouldBe 3L
    lb.getAs[Double]("q_stat") shouldBe expected.toDouble +- 1e-5
  }

  test("kpssTest: exact value on y=(1,2,3) at bandwidth 0; trend >> noise") {
    // e=(-1,0,1), S=(-1,-1,0): eta = (2/9)/(2/3) = 1/3
    val r = TemporalOps.kpssTest(eventsOn(Seq(1, 2, 3)), "ts", 0)
      .collect()(0)
    r.getLong(0) shouldBe 3L
    r.getAs[Double]("eta") shouldBe (1.0 / 3) +- 1e-6
    // a strong trend scores far less stationary than irregular noise,
    // and the verdict is consistent with the 5% critical point
    val trend = TemporalOps.kpssTest(
      eventsOn((1 to 20).map(i => i)), "ts", 3).collect()(0)
    val flat = TemporalOps.kpssTest(
      eventsOn(Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3,
        8, 4)), "ts", 3).collect()(0)
    trend.getAs[Double]("eta") should be > flat.getAs[Double]("eta")
    flat.getAs[Boolean]("level_stationary") shouldBe
      (flat.getAs[Double]("eta") <= 0.463)
    trend.getAs[Boolean]("level_stationary") shouldBe
      (trend.getAs[Double]("eta") <= 0.463)
  }

  test("dominantCycle: a pure period-4 series puts power 1 at period 4") {
    // y = 2,1,0,1 repeating over 8 days: mean 1 → e = 1,0,-1,0,...
    // power(4) = 1.0 exactly; period 8 carries none of it
    val df = eventsOn(Seq(2, 1, 0, 1, 2, 1, 0, 1))
    val rows = TemporalOps.dominantCycle(df, "ts", 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("power"), r.getBoolean(2)))).toMap
    rows(4L)._1 shouldBe 1.0 +- 1e-6
    rows(4L)._2 shouldBe true
    rows(8L)._1 shouldBe 0.0 +- 1e-6
  }

  test("kuiperTest: catches the cyclic shift KS halves") {
    // A=(1,4), B=(2,3): signed gaps 0.5, 0, -0.5, 0 → D+ = D- = 0.5,
    // V = 1.0 while KS alone reports only 0.5
    val df = Seq((1.0, "a"), (4.0, "a"), (2.0, "b"), (3.0, "b"))
      .toDF("v", "g")
    val r = StatsOps.kuiperTest(df, "v", "g", "a", "b").collect()(0)
    r.getAs[Double]("d_plus") shouldBe 0.5 +- 1e-9
    r.getAs[Double]("d_minus") shouldBe 0.5 +- 1e-9
    r.getAs[Double]("v_stat") shouldBe 1.0 +- 1e-9
    StatsOps.ksStatistic(df, "v", "g", "a", "b").collect()(0)
      .getAs[Double]("ks_stat") shouldBe 0.5 +- 1e-9
  }

  test("jarqueBera: exact S/K/JB on the 3-point symmetric fixture") {
    // values (1,2,3): S = 0, K = 1.5, JB = 0.5*(1.5-3)^2/4*3/3 = 0.28125
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val r = StatsOps.jarqueBera(df, "v").collect()(0)
    r.getLong(0) shouldBe 3L
    r.getAs[Double]("skewness") shouldBe 0.0 +- 1e-9
    r.getAs[Double]("kurtosis") shouldBe 1.5 +- 1e-9
    r.getAs[Double]("jb") shouldBe 0.28125 +- 1e-6
  }

  test("jarqueBera: magnitude-robust — large offset values the raw-power " +
    "identity form could not represent") {
    // 100 values at 1e9 + i: the pre-r16 form summed raw x^4 in
    // DECIMAL(38,0) and its (sum x)^4 identity term needs ~52 digits here
    // — ANSI mode THREW (the r16 scale audit caught it live at 6M rows).
    // The anchored two-pass form is spread-bounded; brute-force central
    // moments (centered in plain Scala doubles, safe at n=100) agree.
    val vals = (0 until 100).map(i => 1e9 + i)
    val df = vals.toDF("v")
    val r = StatsOps.jarqueBera(df, "v").collect()(0)
    r.getLong(0) shouldBe 100L
    val mean = vals.sum / vals.size
    val m2 = vals.map(v => math.pow(v - mean, 2)).sum / vals.size
    val m3 = vals.map(v => math.pow(v - mean, 3)).sum / vals.size
    val m4 = vals.map(v => math.pow(v - mean, 4)).sum / vals.size
    val s = m3 / math.pow(m2, 1.5)
    val k = m4 / (m2 * m2)
    r.getAs[Double]("skewness") shouldBe s +- 1e-6
    r.getAs[Double]("kurtosis") shouldBe k +- 1e-6
    r.getAs[Double]("jb") shouldBe
      (100.0 / 6.0 * (s * s + (k - 3.0) * (k - 3.0) / 4.0)) +- 1e-5
  }

  test("distributionDistance: 0 on identical slices, 1 on disjoint") {
    val same = Seq(("x", "a"), ("y", "a"), ("x", "b"), ("y", "b"))
      .toDF("c", "g")
    val r1 = StatsOps.distributionDistance(same, "c", "g", "a", "b")
      .collect()(0)
    r1.getAs[Double]("tvd") shouldBe 0.0 +- 1e-9
    r1.getAs[Double]("bhattacharyya") shouldBe 1.0 +- 1e-9
    r1.getAs[Double]("hellinger") shouldBe 0.0 +- 1e-9
    val disj = Seq(("x", "a"), ("y", "b")).toDF("c", "g")
    val r2 = StatsOps.distributionDistance(disj, "c", "g", "a", "b")
      .collect()(0)
    r2.getAs[Double]("tvd") shouldBe 1.0 +- 1e-9
    r2.getAs[Double]("hellinger") shouldBe 1.0 +- 1e-9
  }

  test("hodgesLehmann: textbook pairwise-difference median with weights") {
    // A=(6,7,9), B=(1,2): diffs sorted (4,5,5,6,7,8), W=6 → (5+6)/2 = 5.5
    val df = Seq((6.0, "a"), (7.0, "a"), (9.0, "a"), (1.0, "b"), (2.0, "b"))
      .toDF("v", "g")
    val r = StatsOps.hodgesLehmann(df, "v", "g", "a", "b").collect()(0)
    r.getLong(2) shouldBe 6L // n_pairs
    r.getAs[Double]("hl_shift") shouldBe 5.5 +- 1e-9
    // odd pair count: A=(1,2), B=(0) → diffs (1,2), W=2 → 1.5
    val d2 = Seq((1.0, "a"), (2.0, "a"), (0.0, "b")).toDF("v", "g")
    StatsOps.hodgesLehmann(d2, "v", "g", "a", "b").collect()(0)
      .getAs[Double]("hl_shift") shouldBe 1.5 +- 1e-9
  }

  test("moodScaleTest: extremes-vs-middle hand value") {
    // A=(1,6) at ranks 1,4; B=(3,4) at 2,3 → M = 2*(1.5)^2 = 4.5,
    // E = 2.5, Var = 4/3 → z = 2/sqrt(4/3) = 1.732051, A is wider
    val df = Seq((1.0, "a"), (6.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("v", "g")
    val r = StatsOps.moodScaleTest(df, "v", "g", "a", "b").collect()(0)
    r.getAs[Double]("m_stat") shouldBe 4.5 +- 1e-9
    r.getAs[Double]("z") shouldBe 1.732051 +- 1e-6
    r.getString(4) shouldBe "wider"
  }

  test("dispersionIndex: zero on constant counts, burst scores high") {
    // g: 2 events on each of 4 days → var 0, dispersion 0;
    // h: 8 events on one day, dense zeros elsewhere → var 16, disp 8
    val rows =
      (1 to 4).flatMap(d => Seq.fill(2)(("g", s"u$d"))) ++
        Seq.fill(8)(("h", "u4"))
    val out = StatsOps.dispersionIndex(rows.toDF("grp", "unit"),
      "grp", "unit").collect()
    val g = out.find(_.getString(0) == "g").get
    g.getLong(1) shouldBe 4L
    g.getAs[Double]("dispersion") shouldBe 0.0 +- 1e-9
    val h = out.find(_.getString(0) == "h").get
    h.getAs[Double]("mean_count") shouldBe 2.0 +- 1e-9
    h.getAs[Double]("variance") shouldBe 16.0 +- 1e-9
    h.getAs[Double]("dispersion") shouldBe 8.0 +- 1e-9
  }

  test("quadeTest: hand F on the 2x2 range-weighted fixture") {
    // block ranges 1 and 4 → weights 1,2 (doubled 2,4); consistent
    // treatment order → F = (b-1)ΣTj²/(bΣT²-ΣTj²) = 72/8 = 9
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0),
      ("b2", "t1", 1.0), ("b2", "t2", 5.0)).toDF("blk", "trt", "v")
    val r = StatsOps.quadeTest(df, "blk", "trt", "v").collect()(0)
    r.getLong(0) shouldBe 2L
    r.getLong(1) shouldBe 2L
    r.getAs[Double]("f_stat") shouldBe 9.0 +- 1e-9
  }

  test("runsTest: forced alternation is detected with the exact z") {
    // 10 days alternating 1, 9: R = 10, n1 = n2 = 5 → E = 6,
    // V = 20/9 → z = 4/sqrt(20/9) = 2.683282, verdict alternating
    val days = (1 to 10).map(i => (
      java.sql.Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"),
      if (i % 2 == 1) 1.0 else 9.0))
    val r = TemporalOps.runsTest(days.toDF("ts", "v"), "ts", "v")
      .collect()(0)
    r.getLong(3) shouldBe 10L // runs
    r.getAs[Double]("z") shouldBe 2.683282 +- 1e-6
    r.getString(5) shouldBe "alternating"
  }

  test("markovStationary: closed-form equilibria on tiny chains") {
    def ev(types: String*) = types.zipWithIndex.map { case (t, i) =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"),
        i.toLong, t)
    }.toDF("u", "ts", "tie", "e")
    // strict 2-cycle A↔B → uniform (0.5, 0.5)
    val flip = TemporalOps.markovStationary(ev("A", "B", "A", "B"),
      "u", "ts", "tie", "e").collect()
    flip.map(_.getAs[Double]("stationary_prob")).foreach(
      _ shouldBe 0.5 +- 1e-6)
    // P(A→A)=2/3, P(A→B)=1/3, P(B→A)=1 → π = (3/4, 1/4)
    val st = TemporalOps.markovStationary(ev("A", "A", "A", "B", "A"),
      "u", "ts", "tie", "e").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("stationary_prob")).toMap
    st("A") shouldBe 0.75 +- 1e-6
    st("B") shouldBe 0.25 +- 1e-6
  }

  test("q_basket_rules is consistent with q_basket_lift on shared pairs") {
    val rules = SparkEntry.queries("q_basket_rules")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getAs[Double]("lift")))).toMap
    val lifts = SparkEntry.queries("q_basket_lift")(spark, sf0001).collect()
    lifts.length should be > 0
    lifts.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (nab, lift) = rules(key)
      nab shouldBe r.getLong(2)
      // same quantity, different float-op order → last-ulp tolerance
      lift shouldBe r.getAs[Double]("lift") +- 1e-6
      // and the directed mirror exists with identical nab
      rules((key._2, key._1))._1 shouldBe nab
    }
  }

  test("iccOneWay: clone groups score 1; shared distribution scores ~0") {
    val clones = Seq(("A", 1.0), ("A", 1.0), ("B", 3.0), ("B", 3.0))
      .toDF("g", "v")
    val r = StatsOps.iccOneWay(clones, "v", "g").collect()(0)
    r.getAs[Double]("n0") shouldBe 2.0 +- 1e-9
    r.getAs[Double]("icc") shouldBe 1.0 +- 1e-6
    val mixed = Seq(("A", 1.0), ("A", 3.0), ("B", 1.0), ("B", 3.0))
      .toDF("g", "v")
    StatsOps.iccOneWay(mixed, "v", "g").collect()(0)
      .getAs[Double]("icc") should be < 0.0 // MSB = 0 pulls ICC negative
  }

  test("cronbachAlpha: identical items give 1; anti-correlated go negative") {
    val same = Seq(("s1", "i1", 1.0), ("s2", "i1", 2.0), ("s3", "i1", 3.0),
      ("s1", "i2", 1.0), ("s2", "i2", 2.0), ("s3", "i2", 3.0))
      .toDF("s", "i", "v")
    StatsOps.cronbachAlpha(same, "s", "i", "v").collect()(0)
      .getAs[Double]("alpha") shouldBe 1.0 +- 1e-6
    // item2 = (3,1,2) against item1 = (1,2,3): cov = -0.5 → alpha = -2
    val anti = Seq(("s1", "i1", 1.0), ("s2", "i1", 2.0), ("s3", "i1", 3.0),
      ("s1", "i2", 3.0), ("s2", "i2", 1.0), ("s3", "i2", 2.0))
      .toDF("s", "i", "v")
    StatsOps.cronbachAlpha(anti, "s", "i", "v").collect()(0)
      .getAs[Double]("alpha") shouldBe -2.0 +- 1e-6
  }

  test("linCcc: identity agrees fully; a constant offset only correlates") {
    val id = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r1 = StatsOps.linCcc(id, "x", "y").collect()(0)
    r1.getAs[Double]("pearson_r") shouldBe 1.0 +- 1e-8
    r1.getAs[Double]("ccc") shouldBe 1.0 +- 1e-8
    // y = x + 5: r stays 1, CCC collapses by the location penalty:
    // 2v/(2v + n·(5)²-in-cents form) = 120000/2370000
    val off = Seq((1.0, 6.0), (2.0, 7.0), (3.0, 8.0)).toDF("x", "y")
    val r2 = StatsOps.linCcc(off, "x", "y").collect()(0)
    r2.getAs[Double]("pearson_r") shouldBe 1.0 +- 1e-8
    r2.getAs[Double]("ccc") shouldBe (120000.0 / 2370000.0) +- 1e-6
  }

  test("blandAltman: hand bias and limits on a two-pair fixture") {
    // diffs (1, 3): bias 2, sd = sqrt(2), loa = 2 -/+ 1.96*sqrt(2)
    val df = Seq((3.0, 2.0), (7.0, 4.0)).toDF("x", "y")
    val r = StatsOps.blandAltman(df, "x", "y").collect()(0)
    r.getAs[Double]("bias") shouldBe 2.0 +- 1e-9
    r.getAs[Double]("sd_diff") shouldBe math.sqrt(2.0) +- 1e-6
    r.getAs[Double]("loa_lo") shouldBe (2.0 - 1.96 * math.sqrt(2.0)) +- 1e-5
    r.getAs[Double]("loa_hi") shouldBe (2.0 + 1.96 * math.sqrt(2.0)) +- 1e-5
  }

  test("newcombeDiffCi composes the per-arm Wilson bounds") {
    val rows = Seq(("a", true), ("a", true), ("a", false), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false))
    val r = StatsOps.newcombeDiffCi(rows.toDF("arm", "ok"), "ok", "arm",
      "a", "b").collect()(0)
    r.getAs[Double]("diff") shouldBe 0.25 +- 1e-9
    // replicate the op's own pinned chain for the bounds
    def wilson(k: Double, n: Double): (Double, Double, Double) = {
      val p = k / n; val z = 1.96; val z2 = z * z
      val c = (p + z2 / (n * 2)) / (1.0 + z2 / n)
      val h = z * math.sqrt(p * (1 - p) / n + z2 / (n * n * 4)) /
        (1.0 + z2 / n)
      (p, c - h, c + h)
    }
    val (pa, la, ua) = wilson(2, 4); val (pb, lb, ub) = wilson(1, 4)
    val d = pa - pb
    r.getAs[Double]("lo") shouldBe
      (d - math.sqrt(math.pow(pa - la, 2) + math.pow(ub - pb, 2))) +- 1e-5
    r.getAs[Double]("hi") shouldBe
      (d + math.sqrt(math.pow(ua - pa, 2) + math.pow(pb - lb, 2))) +- 1e-5
    (r.getAs[Double]("lo") <= d && d <= r.getAs[Double]("hi")) shouldBe true
  }

  test("ksUniform: exact uniform scores 0; a point mass is caught") {
    val unif = (0L to 9L).toDF("v")
    StatsOps.ksUniform(unif, "v").collect()(0)
      .getAs[Double]("d_stat") shouldBe 0.0 +- 1e-9
    val skew = Seq(0L, 0L, 0L, 1L).toDF("v")
    val r = StatsOps.ksUniform(skew, "v").collect()(0)
    r.getAs[Double]("d_stat") shouldBe 0.25 +- 1e-9
    r.getLong(3) shouldBe 0L // at_v
  }

  test("medianTest: full separation gives the 2x2 chi2 of 4") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val r = StatsOps.medianTest(df, "v", "g").collect()(0)
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 2L
    r.getAs[Double]("chi2") shouldBe 4.0 +- 1e-6
    r.getLong(3) shouldBe 1L
  }

  test("bowkerSymmetry: directional flow scores (3-1)^2/4; symmetric scores 0") {
    val dir = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A"))).toDF("a", "b")
    val r = StatsOps.bowkerSymmetry(dir, "a", "b").collect()(0)
    r.getLong(0) shouldBe 1L
    r.getAs[Double]("chi2") shouldBe 1.0 +- 1e-9
    val sym = Seq(("A", "B"), ("B", "A")).toDF("a", "b")
    StatsOps.bowkerSymmetry(sym, "a", "b").collect()(0)
      .getAs[Double]("chi2") shouldBe 0.0 +- 1e-9
  }

  test("spectralEntropy: a pure cycle concentrates relative to noise") {
    // non-divisor periods carry spectral LEAKAGE over a finite window,
    // so even a pure cycle's entropy is well above 0 — the invariant
    // is RELATIVE: the cycle's spectrum is more concentrated than an
    // irregular series', and entropy + concentration = 1
    val cyc = TemporalOps.spectralEntropy(
      eventsOn(Seq(2, 1, 0, 1, 2, 1, 0, 1)), "ts", 8).collect()(0)
    val noise = TemporalOps.spectralEntropy(
      eventsOn(Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7)), "ts", 8)
      .collect()(0)
    noise.getAs[Double]("spectral_entropy") should be >
      cyc.getAs[Double]("spectral_entropy")
    (cyc.getAs[Double]("spectral_entropy") +
      cyc.getAs[Double]("concentration")) shouldBe 1.0 +- 1e-9
  }

  test("poissonRateTest: hand z on a 4-day split") {
    // days 1..4, events (4,0,1,1): halves (day1,2) vs (day3,4):
    // k=(4,2), t=(2,2), z = (4-3)/sqrt(6*0.25) = 0.816497
    val df = eventsOn(Seq(4, 0, 1, 1))
    val r = TemporalOps.poissonRateTest(df, "ts").collect()(0)
    r.getLong(0) shouldBe 4L // k1
    r.getLong(1) shouldBe 2L // t1_days
    r.getLong(2) shouldBe 2L // k2
    r.getAs[Double]("rate1") shouldBe 2.0 +- 1e-9
    r.getAs[Double]("rate2") shouldBe 1.0 +- 1e-9
    r.getAs[Double]("z") shouldBe 0.816497 +- 1e-6
  }

  test("readabilityScores: hand counts on a two-sentence fixture") {
    // "See the cat. It runs away!" → 6 words, 2 sentences,
    // syllables: see(1) the(1) cat(1) / it(1) runs(1) away(2) = 7
    val df = Seq((1L, "See the cat. It runs away!")).toDF("id", "text")
    val r = graft.ext.TextOps.readabilityScores(df, "id", "text")
      .collect()(0)
    r.getLong(1) shouldBe 6L
    r.getLong(2) shouldBe 2L
    r.getLong(3) shouldBe 7L
    val flesch = 206.835 - 6.0 / 2 * 1.015 - 7.0 / 6 * 84.6
    r.getAs[Double]("flesch") shouldBe flesch +- 1e-3
    val fk = 6.0 / 2 * 0.39 + 7.0 / 6 * 11.8 - 15.59
    r.getAs[Double]("fk_grade") shouldBe fk +- 1e-3
  }

  test("docTtr: repetitive vs diverse docs rank correctly, hand counts") {
    val df = Seq((1L, "a a a a"), (2L, "w x y z"), (3L, "p p q r"))
      .toDF("id", "text")
    val out = graft.ext.TextOps.docTtr(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Double]("ttr") shouldBe 0.25 +- 1e-9
    out(1L).getAs[Double]("hapax_share") shouldBe 0.0 +- 1e-9
    out(2L).getAs[Double]("ttr") shouldBe 1.0 +- 1e-9
    out(2L).getAs[Double]("hapax_share") shouldBe 1.0 +- 1e-9
    out(3L).getLong(1) shouldBe 4L // tokens
    out(3L).getLong(2) shouldBe 3L // types
    out(3L).getLong(3) shouldBe 2L // hapax (q, r)
  }

  test("gwetAc1 stays high where prevalence skew crushes kappa") {
    // 19 items rated AA (consensus on the dominant class) + 1 item AB:
    // raw agreement 95%, but kappa's marginal-product chance is also
    // ~95% → kappa near 0 / negative; AC1 stays near 1 — the paradox
    // this statistic exists for
    val rows = (1 to 19).flatMap(i => Seq((s"i$i", "A"), (s"i$i", "A"))) ++
      Seq(("i20", "A"), ("i20", "B"))
    val df = rows.toDF("item", "cat")
    val k = StatsOps.fleissKappa(df, "item", "cat", m = 2).collect()(0)
    val g = StatsOps.gwetAc1(df, "item", "cat", m = 2).collect()(0)
    g.getAs[Double]("p_bar") shouldBe k.getAs[Double]("p_bar") +- 1e-9
    g.getAs[Double]("ac1") should be > 0.9
    k.getAs[Double]("kappa") should be < 0.1
  }

  test("chatterjeeXi: strictly monotone daily values give the closed form") {
    // n=4 distinct increasing values: xi = 1 - 3(n-1)/(n^2-1) = 0.4
    val daily = Seq(
      ("2024-01-01", 10.0), ("2024-01-02", 20.0),
      ("2024-01-03", 30.0), ("2024-01-04", 40.0))
      .toDF("d", "v")
      .select(to_timestamp(col("d")).as("ts"), col("v"))
    val r = TemporalOps.chatterjeeXi(daily, "ts", "v").collect()(0)
    r.getLong(0) shouldBe 4L
    r.getAs[Double]("xi") shouldBe 0.4 +- 1e-8
    // constant series: zero denominator → NULL
    val const = Seq(("2024-01-01", 5.0), ("2024-01-02", 5.0))
      .toDF("d", "v")
      .select(to_timestamp(col("d")).as("ts"), col("v"))
    TemporalOps.chatterjeeXi(const, "ts", "v").collect()(0)
      .isNullAt(1) shouldBe true
  }
}
