package graft

import graft.ops.StatsOps

/**
 * Hand-computed fixtures for the round-16 PAIRED family — every
 * operator enters with (a) an oracle entry, (b) a brute-force/
 * hand-value property spec here, (c) a plan-gate classification in
 * [[graft.plans.PlanAudit]] (the three-part discipline). The spec leg
 * is an INDEPENDENT recomputation (plain Scala), never a restatement
 * of the operator's own algebra — the welchAnova lesson.
 */
class Round16StatsSpec extends SparkSpec {
  private val s2 = spark
  import s2.implicits._

  test("wilcoxonSignedRank: the textbook 5-pair fixture (one zero drop)") {
    // a=(125,115,130,140,140), b=(110,122,125,120,140):
    // d = (15,-7,5,20,0) -> drop the 0; |d| ranks: 5->1, 7->2, 15->3,
    // 20->4; W+ = 3+1+4 = 8; n=4, mu = 4*5/4 = 5,
    // var = 4*5*9/24 = 7.5 (no ties), z = 3/sqrt(7.5) = 1.095445
    val df = Seq((125.0, 110.0), (115.0, 122.0), (130.0, 125.0),
      (140.0, 120.0), (140.0, 140.0)).toDF("a", "b")
    val r = StatsOps.wilcoxonSignedRank(df, "a", "b").collect()(0)
    r.getAs[Long]("n_pairs") shouldBe 4L
    r.getAs[Double]("w_plus") shouldBe 8.0 +- 1e-9
    r.getAs[Double]("z") shouldBe 1.095445 +- 1e-6
  }

  test("wilcoxonSignedRank: tie correction on an all-tied |d| support") {
    // d = (+2, -2, +2): |d| all equal -> average rank 2 each;
    // W+ = 4; n=3, mu = 3, var = 3*4*7/24 - (27-3)/48 = 3.5 - 0.5 = 3,
    // z = 1/sqrt(3) = 0.577350
    val df = Seq((3.0, 1.0), (1.0, 3.0), (5.0, 3.0)).toDF("a", "b")
    val r = StatsOps.wilcoxonSignedRank(df, "a", "b").collect()(0)
    r.getAs[Long]("n_pairs") shouldBe 3L
    r.getAs[Double]("w_plus") shouldBe 4.0 +- 1e-9
    r.getAs[Double]("z") shouldBe 0.577350 +- 1e-6
  }

  test("wilcoxonSignedRank: brute-force agreement on a 40-pair sample") {
    // independent plain-Scala recomputation: rank |d| with average
    // ranks, sum positive ranks, tie-corrected z
    val vals = (1 to 40).map { i =>
      val a = (i * 37 % 19) + 0.25 * (i % 4)
      val b = (i * 23 % 17) + 0.5 * (i % 3)
      (a, b)
    }
    val cents = vals.map { case (a, b) =>
      math.round(a * 100) - math.round(b * 100)
    }.filter(_ != 0L)
    val absSorted = cents.map(math.abs).sorted
    def avgRank(v: Long): Double = {
      val less = absSorted.count(_ < v)
      val eq = absSorted.count(_ == v)
      less + (eq + 1) / 2.0
    }
    val wPlus = cents.filter(_ > 0).map(d => avgRank(math.abs(d))).sum
    val n = cents.size
    val tieMass = absSorted.groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * t * t - t).sum
    val varW = n.toDouble * (n + 1) * (2 * n + 1) / 24.0 - tieMass / 48.0
    val zExp = (wPlus - n * (n + 1) / 4.0) / math.sqrt(varW)

    val r = StatsOps.wilcoxonSignedRank(vals.toDF("a", "b"), "a", "b")
      .collect()(0)
    r.getAs[Long]("n_pairs") shouldBe n.toLong
    r.getAs[Double]("w_plus") shouldBe wPlus +- 1e-9
    r.getAs[Double]("z") shouldBe zExp +- 1e-6
  }

  test("pairedTTest: hand fixture and brute-force variance") {
    // d = (1, 2, 3, -2): mean 1, s^2 = (0+1+4+9)/3 = 14/3,
    // t = 1 / sqrt(14/3/4) = 0.926

    val df = Seq((2.0, 1.0), (5.0, 3.0), (7.0, 4.0), (1.0, 3.0))
      .toDF("a", "b")
    val r = StatsOps.pairedTTest(df, "a", "b").collect()(0)
    r.getAs[Long]("n_pairs") shouldBe 4L
    r.getAs[Long]("df") shouldBe 3L
    r.getAs[Double]("mean_diff") shouldBe 1.0 +- 1e-9
    r.getAs[Double]("t_stat") shouldBe
      (1.0 / math.sqrt(14.0 / 3.0 / 4.0)) +- 1e-6
  }

  test("pairedTTest: null-sided pairs drop; zero variance gives NULL t") {
    val df = Seq((Some(2.0), Some(1.0)), (Some(3.0), Some(2.0)),
      (None, Some(9.0)), (Some(4.0), None)).toDF("a", "b")
    val r = StatsOps.pairedTTest(df, "a", "b").collect()(0)
    r.getAs[Long]("n_pairs") shouldBe 2L
    r.getAs[Double]("mean_diff") shouldBe 1.0 +- 1e-9
    r.isNullAt(r.fieldIndex("t_stat")) shouldBe true // d constant -> var 0
  }

  test("signTest: counts and z; zeros drop") {
    // d signs: +, +, -, 0, + -> n=4, B=3, z = (6-4)/2 = 1.0
    val df = Seq((2.0, 1.0), (5.0, 3.0), (1.0, 3.0), (4.0, 4.0),
      (9.0, 2.0)).toDF("a", "b")
    val r = StatsOps.signTest(df, "a", "b").collect()(0)
    r.getAs[Long]("n_pairs") shouldBe 4L
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Double]("z") shouldBe 1.0 +- 1e-9
  }

  test("paired family: empty and all-zero-difference inputs never throw") {
    val empty = Seq.empty[(Double, Double)].toDF("a", "b")
    StatsOps.wilcoxonSignedRank(empty, "a", "b").collect().length shouldBe 0
    StatsOps.pairedTTest(empty, "a", "b").collect().length shouldBe 0
    StatsOps.signTest(empty, "a", "b").collect().length shouldBe 0
    val allZero = Seq((1.0, 1.0), (2.0, 2.0)).toDF("a", "b")
    StatsOps.wilcoxonSignedRank(allZero, "a", "b").collect().length shouldBe 0
    StatsOps.signTest(allZero, "a", "b").collect().length shouldBe 0
    // paired t keeps zero differences (they are real observations)
    val t0 = StatsOps.pairedTTest(allZero, "a", "b").collect()(0)
    t0.getAs[Long]("n_pairs") shouldBe 2L
    t0.getAs[Double]("mean_diff") shouldBe 0.0 +- 1e-12
  }
}
