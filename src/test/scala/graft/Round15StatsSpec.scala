package graft

import graft.ops.{StatsOps, TemporalOps}
import org.apache.spark.sql.DataFrame

/**
 * Hand-computed fixtures for the round-15 operator wave — every
 * operator enters with (a) an oracle entry, (b) a brute-force/
 * hand-value property spec here, (c) a plan-gate classification in
 * [[graft.plans.PlanAudit]] (the round-13 three-part discipline).
 * Closes with the degenerate-input sweep (empty frames must never
 * throw, NaN, or Inf — the Round14EmptyInputSpec discipline).
 */
class Round15StatsSpec extends SparkSpec {
  private val s2 = spark
  import s2.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("hoover: hand value, and 0 on perfectly even groups") {
    // g1 values (1,1,2,4): μ=2, Σ|x−μ| = 1+1+0+2 = 4, 2Σx = 16 → 0.25
    val df = Seq(("g1", 1.0), ("g1", 1.0), ("g1", 2.0), ("g1", 4.0),
      ("g2", 3.0), ("g2", 3.0)).toDF("g", "v")
    val r = StatsOps.hoover(df, "g", "v").orderBy("g").collect()
    r(0).getAs[Double]("hoover") shouldBe 0.25 +- 1e-9
    r(0).getAs[Double]("total") shouldBe 8.0 +- 1e-9
    r(1).getAs[Double]("hoover") shouldBe 0.0 +- 1e-9
  }

  test("hoover: winner-take-all approaches (n-1)/n; single member is 0") {
    // one member owns everything: Σ|x−μ| = (n−1)μ + (x−μ) = 2(n−1)μ...
    // n=4, x=(8,0,0,0): μ=2, Σ|x−μ| = 6+2+2+2 = 12, 2Σx = 16 → 0.75
    val df = Seq(("g", 8.0), ("g", 0.0), ("g", 0.0), ("g", 0.0),
      ("solo", 5.0)).toDF("g", "v")
    val r = StatsOps.hoover(df, "g", "v").orderBy("g").collect()
    r(0).getAs[Double]("hoover") shouldBe 0.75 +- 1e-9
    r(1).getAs[Double]("hoover") shouldBe 0.0 +- 1e-9
  }

  test("simpsonDiversity: hand values on an even split and a monoculture") {
    val df = Seq(("s1", "a"), ("s1", "a"), ("s1", "b"), ("s1", "b"),
      ("s2", "a"), ("s2", "a")).toDF("g", "c")
    val r = StatsOps.simpsonDiversity(df, "g", "c").orderBy("g").collect()
    // s1: λ = (2·1+2·1)/(4·3) = 1/3 → diversity 2/3; effective 16/8 = 2
    r(0).getAs[Double]("simpson_diversity") shouldBe (2.0 / 3) +- 1e-6
    r(0).getAs[Double]("effective_categories") shouldBe 2.0 +- 1e-9
    // s2: one category → diversity 0, effective 1
    r(1).getAs[Double]("simpson_diversity") shouldBe 0.0 +- 1e-9
    r(1).getAs[Double]("effective_categories") shouldBe 1.0 +- 1e-9
  }

  test("grubbsMaxOutlier: hand value, names the extreme key, earliest tie wins") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 10.0))
      .toDF("k", "v")
    val r = StatsOps.grubbsMaxOutlier(df, "k", "v").collect()(0)
    r.getAs[Long]("n") shouldBe 4L
    r.getAs[Long]("at") shouldBe 4L
    r.getAs[Double]("value") shouldBe 10.0 +- 1e-9
    // mean 4, s = √(50/3) → G = 6/√(50/3) = 1.469694
    r.getAs[Double]("g_stat") shouldBe 6.0 / math.sqrt(50.0 / 3) +- 1e-5
    // tie on |dev|: keys 1 and 3 both sit 1 from mean 2 — earliest wins
    val t = StatsOps.grubbsMaxOutlier(
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v"), "k", "v")
      .collect()(0)
    t.getAs[Long]("at") shouldBe 1L
  }

  test("grubbsMaxOutlier: constant series emits NULL g_stat, not NaN") {
    val r = StatsOps.grubbsMaxOutlier(
      Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("k", "v"), "k", "v")
      .collect()(0)
    r.isNullAt(r.fieldIndex("g_stat")) shouldBe true
  }

  test("cuzickTrend: hand value on two clean dose groups") {
    // dose 1: values {1,2}; dose 2: {3,4} → ranks 1..4, T = 3+2·7 = 17,
    // E = 2.5·6 = 15, Σ(l−l̄)² = 1, Var = 60/36 → z = 2/√(5/3)
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L), (4.0, 2L))
      .toDF("v", "dose")
    val r = StatsOps.cuzickTrend(df, "v", "dose").collect()(0)
    r.getAs[Long]("n") shouldBe 4L
    r.getAs[Long]("k") shouldBe 2L
    r.getAs[Double]("t_stat") shouldBe 17.0 +- 1e-9
    r.getAs[Double]("z") shouldBe 2.0 / math.sqrt(5.0 / 3) +- 1e-5
    r.getAs[String]("direction") shouldBe "up"
  }

  test("cuzickTrend: brute-force midrank T with ties; reversed dose flips the sign") {
    val vals = Seq((1.0, 1L), (1.0, 1L), (2.0, 2L), (2.0, 3L), (3.0, 3L),
      (5.0, 2L), (5.0, 3L), (0.5, 1L))
    val df = vals.toDF("v", "dose")
    val r = StatsOps.cuzickTrend(df, "v", "dose").collect()(0)
    // brute force: midranks over the sorted sample
    val sorted = vals.map(_._1).sorted
    def midrank(v: Double): Double = {
      val lo = sorted.indexOf(v) + 1; val hi = sorted.lastIndexOf(v) + 1
      (lo + hi) / 2.0
    }
    val bruteT = vals.map { case (v, l) => l * midrank(v) }.sum
    r.getAs[Double]("t_stat") shouldBe bruteT +- 1e-9
    val rev = StatsOps.cuzickTrend(
      vals.map { case (v, l) => (v, 4L - l) }.toDF("v", "dose"),
      "v", "dose").collect()(0)
    rev.getAs[Double]("z") shouldBe -r.getAs[Double]("z") +- 1e-6
    rev.getAs[String]("direction") shouldBe
      (if (r.getAs[String]("direction") == "up") "down" else "up")
  }

  test("pageHinkley: hand value — the alarm peaks where the level jumps") {
    val df = Seq((ts(1), 1.0), (ts(2), 1.0), (ts(3), 4.0)).toDF("ts", "v")
    val r = TemporalOps.pageHinkley(df, "ts", "v").collect()(0)
    r.getAs[Long]("n_days") shouldBe 3L
    // devs: 0, 0, (3·400−600)/3/100 = 2 → M = [0,0,2], peak 2.0 on day 3
    r.getAs[Double]("ph_stat") shouldBe 2.0 +- 1e-9
    r.getAs[java.sql.Timestamp]("at_day") shouldBe ts(3)
  }

  test("pageHinkley: a flat series alarms 0; delta suppresses sub-threshold drift") {
    val flat = Seq((ts(1), 2.0), (ts(2), 2.0), (ts(3), 2.0)).toDF("ts", "v")
    TemporalOps.pageHinkley(flat, "ts", "v").collect()(0)
      .getAs[Double]("ph_stat") shouldBe 0.0 +- 1e-9
    val df = Seq((ts(1), 1.0), (ts(2), 1.0), (ts(3), 4.0)).toDF("ts", "v")
    // δ = 5 swallows the 2.0 deviation entirely
    TemporalOps.pageHinkley(df, "ts", "v", delta = 5.0).collect()(0)
      .getAs[Double]("ph_stat") shouldBe 0.0 +- 1e-9
  }

  test("permutationEntropy: monotone series scores 0, two balanced patterns score ln2") {
    val mono = Seq((ts(1), 1.0), (ts(2), 2.0), (ts(3), 3.0), (ts(4), 4.0))
      .toDF("ts", "v")
    val r1 = TemporalOps.permutationEntropy(mono, "ts", "v").collect()(0)
    r1.getAs[Long]("n_windows") shouldBe 2L
    r1.getAs[Long]("n_patterns") shouldBe 1L
    r1.getAs[Double]("perm_entropy") shouldBe 0.0 +- 1e-9
    // 1,3,2,4 → patterns (a≤b, c<a? no...) two distinct patterns, 50/50
    val zig = Seq((ts(1), 1.0), (ts(2), 3.0), (ts(3), 2.0), (ts(4), 4.0))
      .toDF("ts", "v")
    val r2 = TemporalOps.permutationEntropy(zig, "ts", "v").collect()(0)
    r2.getAs[Long]("n_patterns") shouldBe 2L
    r2.getAs[Double]("perm_entropy") shouldBe math.log(2) +- 1e-6
    r2.getAs[Double]("normalized_entropy") shouldBe
      (math.log(2) / math.log(6)) +- 1e-6
  }

  test("energyDistance1D: equals Székely's 2E|X−Y|−E|X−X'|−E|Y−Y'| pair form") {
    val a = Seq(0.0, 0.0, 1.0); val b = Seq(1.0, 1.0, 1.0)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val r = StatsOps.energyDistance1D(df, "v", "g", "A", "B").collect()(0)
    def meanAbs(x: Seq[Double], y: Seq[Double]) =
      (for (i <- x; j <- y) yield math.abs(i - j)).sum / (x.size * y.size)
    val brute = 2 * meanAbs(a, b) - meanAbs(a, a) - meanAbs(b, b)
    r.getAs[Double]("energy") shouldBe brute +- 1e-6 // 8/9
    r.getAs[Long]("n_a") shouldBe 3L
    r.getAs[Long]("n_b") shouldBe 3L
  }

  test("energyDistance1D: brute-force parity on a messier sample; 0 on identical") {
    val a = Seq(1.0, 2.0, 2.0, 5.0, 7.0); val b = Seq(2.0, 3.0, 6.0)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    def meanAbs(x: Seq[Double], y: Seq[Double]) =
      (for (i <- x; j <- y) yield math.abs(i - j)).sum / (x.size * y.size)
    val brute = 2 * meanAbs(a, b) - meanAbs(a, a) - meanAbs(b, b)
    StatsOps.energyDistance1D(df, "v", "g", "A", "B").collect()(0)
      .getAs[Double]("energy") shouldBe brute +- 1e-6
    val same = (a.map(("A", _)) ++ a.map(("B", _))).toDF("g", "v")
    StatsOps.energyDistance1D(same, "v", "g", "A", "B").collect()(0)
      .getAs[Double]("energy") shouldBe 0.0 +- 1e-9
    // single-point pooled support (every value equal, both sides
    // non-empty): identical distributions, so a row MUST come back with
    // energy exactly 0 — the pre-r16 cut filtered the lead-null support
    // row and emitted nothing here
    val onePoint = Seq(("A", 3.0), ("A", 3.0), ("B", 3.0)).toDF("g", "v")
    val p = StatsOps.energyDistance1D(onePoint, "v", "g", "A", "B").collect()
    p.length shouldBe 1
    p(0).getAs[Long]("n_a") shouldBe 2L
    p(0).getAs[Long]("n_b") shouldBe 1L
    p(0).getAs[Double]("energy") shouldBe 0.0 +- 1e-12
  }

  test("welchAnova: brute-force F* and df2 on unequal-variance groups") {
    val g1 = Seq(1.0, 2.0, 3.0); val g2 = Seq(10.0, 14.0)
    val g3 = Seq(4.0, 4.5, 5.0, 9.0)
    val df = (g1.map(("a", _)) ++ g2.map(("b", _)) ++ g3.map(("c", _)))
      .toDF("g", "v")
    val r = StatsOps.welchAnova(df, "v", "g").collect()(0)
    // brute force in cents, mirroring the operator's unit contract
    val gs = Seq(g1, g2, g3).map(_.map(_ * 100))
    val ms = gs.map(x => x.sum / x.size)
    val vs = gs.zip(ms).map { case (x, m) =>
      x.map(v => (v - m) * (v - m)).sum / (x.size - 1) }
    val ws = gs.zip(vs).map { case (x, v) => x.size / v }
    val bigW = ws.sum
    val mbar = ws.zip(ms).map { case (w, m) => w * m }.sum / bigW
    val aSum = ws.zip(ms).map { case (w, m) => w * (m - mbar) * (m - mbar) }.sum
    val lSum = gs.zip(ws).map { case (x, w) =>
      (1 - w / bigW) * (1 - w / bigW) / (x.size - 1) }.sum
    val k = 3.0
    val f = aSum / (k - 1) / (1 + 2 * (k - 2) / (k * k - 1) * lSum)
    val df2 = (k * k - 1) / (3 * lSum)
    r.getAs[Long]("n") shouldBe 9L
    r.getAs[Long]("n_groups") shouldBe 3L
    r.getAs[Double]("f_stat") shouldBe f +- 1e-4
    r.getAs[Double]("df2") shouldBe df2 +- 1e-4
  }

  test("welchAnova: zero-variance and singleton groups are excluded, not poison") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 7.0), ("b", 9.0),
      ("const", 5.0), ("const", 5.0), // zero variance → no weight
      ("solo", 42.0)) // n=1 → no variance at all
      .toDF("g", "v")
    val r = StatsOps.welchAnova(df, "v", "g").collect()(0)
    r.getAs[Long]("n_groups") shouldBe 2L
    r.getAs[Long]("n") shouldBe 5L
    r.isNullAt(r.fieldIndex("f_stat")) shouldBe false
  }

  test("brownForsythe: brute-force F on median-centered deviations; outlier-robust centers") {
    val g1 = Seq(1.0, 2.0, 3.0, 100.0) // median 2.5 — the outlier can't drag it
    val g2 = Seq(5.0, 6.0, 7.0)
    val df = (g1.map(("a", _)) ++ g2.map(("b", _))).toDF("g", "v")
    val r = StatsOps.brownForsythe(df, "v", "g").collect()(0)
    def med(x: Seq[Double]) = { val s = x.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2 }
    val zs = Seq(g1, g2).map(x => x.map(v => math.abs(v - med(x))))
    val all = zs.flatten; val n = all.size; val k = 2
    val gm = all.sum / n
    val ssb = zs.map(z => z.size * math.pow(z.sum / z.size - gm, 2)).sum
    val ssw = zs.map(z => { val m = z.sum / z.size
      z.map(v => (v - m) * (v - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    r.getAs[Long]("n") shouldBe 7L
    r.getAs[Double]("f_stat") shouldBe f +- 1e-4
  }

  test("brownForsythe: equal spreads stay near 0 while a variance-shifted group is caught") {
    val calm = (1 to 20).map(i => ("a", (i % 5).toDouble)) ++
      (1 to 20).map(i => ("b", (i % 5).toDouble))
    StatsOps.brownForsythe(calm.toDF("g", "v"), "v", "g").collect()(0)
      .getAs[Double]("f_stat") shouldBe 0.0 +- 1e-6
    val wild = (1 to 20).map(i => ("a", (i % 5).toDouble)) ++
      (1 to 20).map(i => ("b", (i % 5) * 10.0))
    StatsOps.brownForsythe(wild.toDF("g", "v"), "v", "g").collect()(0)
      .getAs[Double]("f_stat") should be > 10.0
  }

  test("gamesHowell: collapses to Tukey's q when variances and sizes are equal; brute-force df") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val gh = StatsOps.gamesHowell(df, "v", "g").collect()(0)
    val tk = StatsOps.tukeyHsd(df, "v", "g").collect()(0)
    gh.getAs[Double]("q_stat") shouldBe tk.getAs[Double]("q_stat") +- 1e-6
    // equal v=1, n=3 → df = (2/3)²/(2·(1/3)²/2) = 4 (the W-S identity)
    gh.getAs[Double]("df") shouldBe 4.0 +- 1e-6
    // brute force on unequal groups
    val g1 = Seq(1.0, 2.0, 3.0); val g2 = Seq(10.0, 14.0, 30.0, 2.0)
    val d2 = (g1.map(("a", _)) ++ g2.map(("b", _))).toDF("g", "v")
    val r = StatsOps.gamesHowell(d2, "v", "g").collect()(0)
    def mv(x: Seq[Double]) = { val m = x.sum / x.size
      (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1)) }
    val (m1, v1) = mv(g1); val (m2, v2) = mv(g2)
    val se2 = v1 / g1.size + v2 / g2.size
    r.getAs[Double]("q_stat") shouldBe
      (math.abs(m1 - m2) / math.sqrt(se2 / 2)) +- 1e-4
    r.getAs[Double]("df") shouldBe (se2 * se2 /
      (math.pow(v1 / g1.size, 2) / (g1.size - 1) +
        math.pow(v2 / g2.size, 2) / (g2.size - 1))) +- 1e-3
  }

  test("siegelSlope: recovers an exact line, and survives 2 corrupt days of 6") {
    val line = (1 to 5).map(i => (ts(i), 10.0 + 2 * (i - 1))).toDF("ts", "v")
    TemporalOps.siegelSlope(line, "ts", "v").collect()(0)
      .getAs[Double]("slope") shouldBe 2.0 +- 1e-8
    // days 3 and 5 corrupted by +1000 — per-day medians of the four
    // clean days still read 2.0, and the median of medians holds
    val vals = Seq(10.0, 12.0, 1014.0, 16.0, 1018.0, 20.0)
    val dirty = vals.zipWithIndex.map { case (v, i) => (ts(i + 1), v) }
      .toDF("ts", "v")
    TemporalOps.siegelSlope(dirty, "ts", "v").collect()(0)
      .getAs[Double]("slope") shouldBe 2.0 +- 1e-8
  }

  private def emptyNum: DataFrame =
    Seq.empty[(String, Double)].toDF("g", "v")
  private def emptyTs: DataFrame =
    Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "v")
  private def emptyKeyed: DataFrame =
    Seq.empty[(Long, Double)].toDF("k", "v")
  private def emptyDose: DataFrame =
    Seq.empty[(Double, Long)].toDF("v", "dose")

  private def ok(name: String)(df: => DataFrame): Unit = {
    val rows = df.collect()
    withClue(s"$name emitted a non-finite value: ") {
      rows.foreach { r =>
        (0 until r.length).foreach { i =>
          r.get(i) match {
            case d: java.lang.Double =>
              (d.isNaN || d.isInfinite) shouldBe false
            case _ =>
          }
        }
      }
    }
  }

  test("round-15 operators survive empty input") {
    ok("hoover")(StatsOps.hoover(emptyNum, "g", "v"))
    ok("simpsonDiversity")(StatsOps.simpsonDiversity(
      Seq.empty[(String, String)].toDF("g", "c"), "g", "c"))
    ok("grubbsMaxOutlier")(StatsOps.grubbsMaxOutlier(emptyKeyed, "k", "v"))
    ok("cuzickTrend")(StatsOps.cuzickTrend(emptyDose, "v", "dose"))
    ok("pageHinkley")(TemporalOps.pageHinkley(emptyTs, "ts", "v"))
    ok("permutationEntropy")(
      TemporalOps.permutationEntropy(emptyTs, "ts", "v"))
    ok("energyDistance1D")(
      StatsOps.energyDistance1D(emptyNum, "v", "g", "A", "B"))
    ok("welchAnova")(StatsOps.welchAnova(emptyNum, "v", "g"))
    ok("brownForsythe")(StatsOps.brownForsythe(emptyNum, "v", "g"))
    ok("gamesHowell")(StatsOps.gamesHowell(emptyNum, "v", "g"))
    ok("siegelSlope")(TemporalOps.siegelSlope(emptyTs, "ts", "v"))
  }
}
