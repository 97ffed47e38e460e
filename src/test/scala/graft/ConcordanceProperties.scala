package graft

import graft.ops.StatsOps
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/**
 * Property-based cross-checks for the concordance/effect-size family
 * against BRUTE-FORCE O(n²) pair enumeration on random tie-heavy
 * inputs — the engine computes τ-b from 2-D prefix sums and δ from the
 * doubled-rank identity specifically to avoid the pair join, so the
 * pair join is the natural independent referee. Small generated
 * frames, tuned-down case count (each case is a real Spark job).
 */
object ConcordanceProperties extends Properties("Concordance") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pairGen: Gen[List[(Double, Long)]] =
    Gen.listOfN(30, for {
      x <- Gen.chooseNum(0, 5)
      y <- Gen.chooseNum(0, 4)
    } yield (x.toDouble, y.toLong))

  property("kendallTauB C/D/tau match brute-force pair enumeration") =
    forAll(pairGen) { rows =>
      val df = rows.toDF("x", "y")
      val r = StatsOps.kendallTauB(df, "x", "y").head()
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      for (i <- rows.indices; j <- rows.indices if i < j) {
        val ((xi, yi), (xj, yj)) = (rows(i), rows(j))
        val sx = math.signum(xi.compareTo(xj))
        val sy = math.signum(yi.compareTo(yj))
        if (sx != 0 && sy != 0) { if (sx == sy) c += 1 else d += 1 }
        if (sx == 0) tx += 1
        if (sy == 0) ty += 1
      }
      val n = rows.size.toLong
      val n0 = n * (n - 1) / 2
      val okCd = r.getAs[Long]("concordant") == c &&
        r.getAs[Long]("discordant") == d
      val d1 = (n0 - tx).toDouble; val d2 = (n0 - ty).toDouble
      val okTau =
        if (d1 > 0 && d2 > 0) {
          val expect = (c - d).toDouble / math.sqrt(d1 * d2)
          math.abs(r.getAs[Double]("tau_b") - expect) < 1e-6
        } else r.isNullAt(r.fieldIndex("tau_b"))
      okCd && okTau
    }

  private val groupedGen: Gen[List[(String, Double)]] =
    Gen.listOfN(30, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(0, 6)
    } yield (g, v.toDouble))

  property("cliffsDelta matches brute-force P(a>b) - P(a<b)") =
    forAll(groupedGen) { rows =>
      val as = rows.collect { case ("a", v) => v }
      val bs = rows.collect { case ("b", v) => v }
      if (as.isEmpty || bs.isEmpty) true
      else {
        val df = rows.toDF("g", "v")
        val got = StatsOps.cliffsDelta(df, "v", "g", "a", "b")
          .head().getAs[Double]("cliffs_delta")
        val wins = (for (a <- as; b <- bs) yield math.signum(a - b)).sum
        math.abs(got - wins / (as.size.toDouble * bs.size)) < 1e-6
      }
    }

  property("wasserstein1D matches brute-force sorted-sample distance " +
    "on equal-size slices") =
    forAll(Gen.listOfN(12, Gen.chooseNum(0, 9))) { xs =>
      // for equal-size samples, W1 = (1/n)·Σ|x_(i) - y_(i)|
      val ys = xs.map(v => (v + 3) % 10)
      val rows = xs.map(v => ("a", v.toDouble)) ++
        ys.map(v => ("b", v.toDouble))
      val df = rows.toDF("g", "v")
      val got = StatsOps.wasserstein1D(df, "v", "g", "a", "b")
        .head().getAs[Double]("w1")
      val expect = xs.sorted.zip(ys.sorted)
        .map { case (a, b) => math.abs(a - b).toDouble }.sum / xs.size
      math.abs(got - expect) < 1e-6
    }

  property("brunnerMunzel matches the brute-force mid-rank computation") =
    forAll(Gen.listOfN(24, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(0, 5)
    } yield (g, v.toDouble))) { rows =>
      val as = rows.collect { case ("a", v) => v }
      val bs = rows.collect { case ("b", v) => v }
      if (as.size < 2 || bs.size < 2) true
      else {
        def midRanks(in: Seq[Double], of: Seq[Double]): Seq[Double] =
          of.map(v => in.count(_ < v) + (in.count(_ == v) + 1) / 2.0)
        val pooled = as ++ bs
        val rcA = midRanks(pooled, as); val rcB = midRanks(pooled, bs)
        val rA = midRanks(as, as); val rB = midRanks(bs, bs)
        val na = as.size; val nb = bs.size
        val ma = rcA.sum / na; val mb = rcB.sum / nb
        val sA = rcA.zip(rA).map { case (rc, r) =>
          math.pow(rc - r - ma + (na + 1) / 2.0, 2) }.sum / (na - 1)
        val sB = rcB.zip(rB).map { case (rc, r) =>
          math.pow(rc - r - mb + (nb + 1) / 2.0, 2) }.sum / (nb - 1)
        val pExp = (mb - (nb + 1) / 2.0) / na
        val r = StatsOps.brunnerMunzel(rows.toDF("g", "v"), "v", "g",
          "a", "b").head()
        val pOk = math.abs(r.getAs[Double]("p_hat") - pExp) < 1e-5
        val denom = na * sA + nb * sB
        if (denom > 0) {
          val wExp = na * nb * (mb - ma) / ((na + nb) * math.sqrt(denom))
          val dfExp = denom * denom /
            (math.pow(na * sA, 2) / (na - 1) + math.pow(nb * sB, 2) / (nb - 1))
          pOk && math.abs(r.getAs[Double]("w_stat") - wExp) < 1e-4 &&
            math.abs(r.getAs[Double]("df") - dfExp) < 1e-3
        } else pOk && r.isNullAt(r.fieldIndex("w_stat"))
      }
    }

  property("logRankTest is antisymmetric in the arm labels") =
    forAll(Gen.listOfN(20, for {
      t <- Gen.chooseNum(0, 6)
      e <- Gen.oneOf(true, false)
      g <- Gen.oneOf("a", "b")
    } yield (t.toLong, e, g))) { rows =>
      val hasBoth = rows.exists(_._3 == "a") && rows.exists(_._3 == "b")
      val hasEvent = rows.exists(_._2)
      if (!hasBoth || !hasEvent) true
      else {
        val df = rows.toDF("dur", "ev", "g")
        val ab = StatsOps.logRankTest(df, "dur", "ev", "g", "a", "b").head()
        val ba = StatsOps.logRankTest(df, "dur", "ev", "g", "b", "a").head()
        val za = Option(ab.getAs[java.lang.Double]("z"))
        val zb = Option(ba.getAs[java.lang.Double]("z"))
        (za, zb) match {
          case (Some(x), Some(y)) =>
            // chi2 agrees; z flips sign (up to the 6dp rounding grain)
            math.abs(x + y) < 2e-6 &&
              math.abs(ab.getAs[Double]("chi2") - ba.getAs[Double]("chi2")) < 2e-6
          case (None, None) => true
          case _ => false
        }
      }
    }
}
