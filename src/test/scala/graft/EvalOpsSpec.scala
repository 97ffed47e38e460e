package graft

import graft.ops.{EvalOps, StatsOps}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics on hand-computed fixtures: exact AUC via
  * rank-sum (incl. the Mann–Whitney identity), Brier bounds, reliability
  * bins, and Cohen's kappa on the textbook 2×2. */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: 1 on separation, 0 reversed, ½ on all-tied; single class empty") {
    val sep = (Seq.fill(8)((1.0, false)) ++ Seq.fill(5)((9.0, true)))
      .toDF("s", "y")
    EvalOps.rocAuc(sep, "s", "y").head().getAs[Double]("auc") shouldBe 1.0
    val rev = (Seq.fill(8)((9.0, false)) ++ Seq.fill(5)((1.0, true)))
      .toDF("s", "y")
    EvalOps.rocAuc(rev, "s", "y").head().getAs[Double]("auc") shouldBe 0.0
    // every score tied: each positive-negative pair counts ½ → AUC ½
    val flat = (Seq.fill(6)((4.0, false)) ++ Seq.fill(3)((4.0, true)))
      .toDF("s", "y")
    val f = EvalOps.rocAuc(flat, "s", "y").head()
    f.getAs[Long]("n_pos") shouldBe 3L
    f.getAs[Long]("n_neg") shouldBe 6L
    f.getAs[Double]("auc") shouldBe 0.5
    EvalOps.rocAuc(Seq((1.0, true), (2.0, true)).toDF("s", "y"), "s", "y")
      .count() shouldBe 0L
  }

  test("rocAuc equals the Mann–Whitney U identity on random ties") {
    val rng = new scala.util.Random(17L)
    val rows = Seq.fill(80)((rng.nextInt(10).toDouble, rng.nextBoolean()))
    val auc = EvalOps.rocAuc(rows.toDF("s", "y"), "s", "y")
      .head().getAs[Double]("auc")
    // U⁺/(n⁺·n⁻) from the independent mannWhitneyU implementation
    val u = StatsOps.mannWhitneyU(
      rows.map { case (s, y) => (s, if (y) "p" else "n") }.toDF("v", "g"),
      "v", "g", "p", "n").head()
    val byU = u.getAs[Double]("u_a") /
      (u.getAs[Long]("n_a") * u.getAs[Long]("n_b"))
    auc shouldBe (byU +- 1e-8)
  }

  test("brierScore: 0 perfect, 0.25 at constant-half, 1 at inverted") {
    val perfect = Seq((1.0, true), (0.0, false), (1.0, true)).toDF("p", "y")
    EvalOps.brierScore(perfect, "p", "y")
      .head().getAs[Double]("brier") shouldBe 0.0
    val half = Seq((0.5, true), (0.5, false)).toDF("p", "y")
    EvalOps.brierScore(half, "p", "y")
      .head().getAs[Double]("brier") shouldBe 0.25
    val inverted = Seq((0.0, true), (1.0, false)).toDF("p", "y")
    EvalOps.brierScore(inverted, "p", "y")
      .head().getAs[Double]("brier") shouldBe 1.0
  }

  test("calibrationBins: bin edges, top-bin fold, mean/frac/gap exact") {
    val rows = Seq(
      (0.05, false), (0.07, true),          // bin 0
      (0.52, true), (0.58, false),          // bin 5
      (0.95, true), (1.0, true))            // bin 9 (p=1 folds in)
      .toDF("p", "y")
    val out = EvalOps.calibrationBins(rows, "p", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    out.keySet shouldBe Set(0L, 5L, 9L)
    out(0L) shouldBe ((2L, 0.06, 0.5, -0.44))
    out(5L) shouldBe ((2L, 0.55, 0.5, 0.05))
    out(9L) shouldBe ((2L, 0.975, 1.0, -0.025))
  }

  test("cohenKappa: textbook 2×2 gives 0.4; degenerate raters handled") {
    // contingency [[20,5],[10,15]]: po=0.7, pe=0.5 → κ = 0.4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "z")) ++
      Seq.fill(10)(("z", "x")) ++ Seq.fill(15)(("z", "z"))
    val k = EvalOps.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    k.getAs[Long]("n") shouldBe 50L
    k.getAs[Double]("po") shouldBe 0.7
    k.getAs[Double]("pe") shouldBe 0.5
    k.getAs[Double]("kappa") shouldBe 0.4
    // both raters constant and agreeing: κ = 1 by convention
    val const = Seq.fill(9)(("x", "x")).toDF("a", "b")
    EvalOps.cohenKappa(const, "a", "b")
      .head().getAs[Double]("kappa") shouldBe 1.0
    // constant but disjoint: po = pe = 0 → κ = 0 (all-integer form)
    val disjoint = Seq.fill(9)(("x", "z")).toDF("a", "b")
    EvalOps.cohenKappa(disjoint, "a", "b")
      .head().getAs[Double]("kappa") shouldBe 0.0
    // perfect agreement over a varied label set: κ = 1
    val varied = Seq("x", "y", "z", "x", "y").map(v => (v, v)).toDF("a", "b")
    EvalOps.cohenKappa(varied, "a", "b")
      .head().getAs[Double]("kappa") shouldBe 1.0
  }
}
