package graft

import graft.ops.{EvalOps, StatsOps}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/**
 * Property-based invariants for the rank-statistics / evaluation family
 * (SURVEY.md §5): bound laws, the U ↔ AUC identity, and monotone-transform
 * invariance — on random tie-heavy inputs, where hand fixtures can't reach.
 * Small generated frames through the shared session; case count tuned down
 * — each case is a real Spark job.
 */
object RankStatsProperties extends Properties("RankStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // tie-heavy pairs: a narrow integer domain forces fractional ranks
  private val pairGen: Gen[List[(Double, Double)]] =
    Gen.listOfN(40, for {
      x <- Gen.chooseNum(0, 8)
      y <- Gen.chooseNum(0, 8)
    } yield (x.toDouble, y.toDouble))

  private val labeledGen: Gen[List[(Double, Boolean)]] =
    Gen.listOfN(40, for {
      s <- Gen.chooseNum(0, 8)
      y <- Gen.oneOf(true, false)
    } yield (s.toDouble, y))

  property("spearman stays in [-1, 1] and is symmetric in its arguments") =
    forAll(pairGen) { rows =>
      val df = rows.toDF("x", "y")
      val r = StatsOps.spearmanCorr(df, "x", "y").head()
      val rho = Option(r.getAs[java.lang.Double]("rho"))
      val swapped = Option(StatsOps.spearmanCorr(df, "y", "x")
        .head().getAs[java.lang.Double]("rho"))
      Prop(rho.forall(v => v >= -1.0 && v <= 1.0) && rho == swapped) :|
        s"rho=$rho swapped=$swapped"
    }

  property("spearman is invariant under strictly increasing transforms") =
    forAll(pairGen) { rows =>
      val base = StatsOps.spearmanCorr(rows.toDF("x", "y"), "x", "y")
        .head().getAs[java.lang.Double]("rho")
      val warped = StatsOps.spearmanCorr(
        rows.map { case (x, y) => (x * x * x + 2 * x, math.exp(y / 3)) }
          .toDF("x", "y"), "x", "y")
        .head().getAs[java.lang.Double]("rho")
      Prop(base == warped) :| s"base=$base warped=$warped"
    }

  property("mannWhitney: U_a + U_b = n_a·n_b and AUC = U_a/(n_a·n_b)") =
    forAll(labeledGen) { rows =>
      val both = rows.exists(_._2) && rows.exists(!_._2)
      if (!both) Prop(true)
      else {
        val u = StatsOps.mannWhitneyU(
          rows.map { case (s, y) => (s, if (y) "p" else "n") }
            .toDF("v", "g"), "v", "g", "p", "n").head()
        val na = u.getAs[Long]("n_a"); val nb = u.getAs[Long]("n_b")
        val ua = u.getAs[Double]("u_a"); val ub = u.getAs[Double]("u_b")
        val auc = EvalOps.rocAuc(rows.toDF("s", "y"), "s", "y")
          .head().getAs[Double]("auc")
        val byU = BigDecimal(ua / (na * nb))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        Prop(ua + ub == (na * nb).toDouble && auc == byU) :|
          s"ua=$ua ub=$ub na=$na nb=$nb auc=$auc byU=$byU"
      }
    }

  property("tCloseness EMD lands in [0, 1]; the global cell scores 0") =
    forAll(pairGen) { rows =>
      val df = rows.map { case (x, y) =>
        (if (x < 4) "a" else "b", y) }.toDF("cell", "v")
      val out = QualityOut(df)
      val all = rows.map { case (_, y) => ("g", y) }.toDF("cell", "v")
      val whole = graft.ops.QualityCheck
        .tCloseness(all, Seq("cell"), "v", t = 1.0)
        .head().getAs[Double]("emd")
      Prop(out.forall(e => e >= 0.0 && e <= 1.0) && whole == 0.0) :|
        s"emds=$out whole=$whole"
    }

  private def QualityOut(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    graft.ops.QualityCheck.tCloseness(df, Seq("cell"), "v", t = 1.0)
      .collect().toSeq.map(_.getAs[Double]("emd"))

  property("cohenKappa ≤ 1, equals 1 iff po = 1; brier in [0, 1]") =
    forAll(labeledGen) { rows =>
      val k = EvalOps.cohenKappa(
        rows.map { case (s, y) => (s > 4, y) }.toDF("a", "b"), "a", "b")
        .head()
      val kappa = Option(k.getAs[java.lang.Double]("kappa"))
      val po = k.getAs[Double]("po")
      val b = EvalOps.brierScore(
        rows.map { case (s, y) => (s / 8.0, y) }.toDF("p", "y"), "p", "y")
        .head().getAs[Double]("brier")
      Prop(kappa.forall(_ <= 1.0 + 1e-9) &&
        kappa.forall(v => (v == 1.0) == (po == 1.0)) &&
        b >= 0.0 && b <= 1.0) :| s"kappa=$kappa po=$po brier=$b"
    }
}
