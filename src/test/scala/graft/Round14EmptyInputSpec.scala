package graft

import graft.ops.{EvalOps, StatsOps, TemporalOps}
import org.apache.spark.sql.DataFrame

/**
 * Degenerate-input sweep for every round-14 operator: an EMPTY input
 * frame (right schema, zero rows) must yield an empty or well-formed
 * result — never an exception, an Infinity, or a NaN row. The
 * empty-slice case is the first thing a scheduled pipeline hits on a
 * quiet day, and the NullSafetySpec discipline extended to the new
 * surface.
 */
class Round14EmptyInputSpec extends SparkSpec {
  private val s2 = spark
  import s2.implicits._

  private def emptyNum: DataFrame =
    Seq.empty[(String, Double)].toDF("g", "v")
  private def emptyPair: DataFrame =
    Seq.empty[(String, String)].toDF("a", "b")
  private def emptyBlocks: DataFrame =
    Seq.empty[(String, String, Double)].toDF("blk", "trt", "v")
  private def emptyTs: DataFrame =
    Seq.empty[(java.sql.Timestamp, Double)].toDF("ts", "v")
  private def emptyUnits: DataFrame =
    Seq.empty[(Long, Boolean)].toDF("dur", "ev")

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

  test("round-14 stats operators survive empty input") {
    ok("somersD")(StatsOps.somersD(emptyNum, "g", "v"))
    ok("gkLambda")(StatsOps.gkLambda(emptyPair, "a", "b"))
    ok("theilsU")(StatsOps.theilsU(emptyPair, "a", "b"))
    ok("kendallW")(StatsOps.kendallW(emptyBlocks, "blk", "trt", "v"))
    ok("cochranQ")(StatsOps.cochranQ(emptyBlocks, "blk", "trt", "v"))
    ok("fleissKappa")(StatsOps.fleissKappa(emptyPair, "a", "b", m = 2))
    ok("gwetAc1")(StatsOps.gwetAc1(emptyPair, "a", "b", m = 2))
    ok("quadeTest")(StatsOps.quadeTest(emptyBlocks, "blk", "trt", "v"))
    ok("theilIndex")(StatsOps.theilIndex(emptyNum, "g", "v"))
    ok("atkinsonIndex")(StatsOps.atkinsonIndex(emptyNum, "g", "v"))
    ok("jarqueBera")(StatsOps.jarqueBera(emptyNum, "v"))
    ok("medianTest")(StatsOps.medianTest(emptyNum, "v", "g"))
    ok("bowkerSymmetry")(StatsOps.bowkerSymmetry(emptyPair, "a", "b"))
    ok("iccOneWay")(StatsOps.iccOneWay(emptyNum, "v", "g"))
    ok("cronbachAlpha")(
      StatsOps.cronbachAlpha(emptyBlocks, "blk", "trt", "v"))
  }

  test("round-14 two-sample operators survive empty and one-sided input") {
    ok("hodgesLehmann")(StatsOps.hodgesLehmann(emptyNum, "v", "g", "a", "b"))
    ok("moodScaleTest")(StatsOps.moodScaleTest(emptyNum, "v", "g", "a", "b"))
    ok("kuiperTest")(StatsOps.kuiperTest(emptyNum, "v", "g", "a", "b"))
    ok("distributionDistance")(
      StatsOps.distributionDistance(emptyPair, "a", "b", "x", "y"))
    ok("newcombeDiffCi")(StatsOps.newcombeDiffCi(
      Seq.empty[(String, Boolean)].toDF("arm", "okc"), "okc", "arm",
      "a", "b"))
    ok("ksUniform")(StatsOps.ksUniform(Seq.empty[Long].toDF("v"), "v"))
    ok("dispersionIndex")(StatsOps.dispersionIndex(emptyPair, "a", "b"))
    ok("linCcc")(StatsOps.linCcc(
      Seq.empty[(Double, Double)].toDF("x", "y"), "x", "y"))
    ok("blandAltman")(StatsOps.blandAltman(
      Seq.empty[(Double, Double)].toDF("x", "y"), "x", "y"))
    // one-sided: only group a present — every op must emit no row (or
    // a NULL-statistic row), never divide by the absent side
    val oneSided = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
      .select(col("v"), col("g"))
    ok("hodgesLehmann/1side")(
      StatsOps.hodgesLehmann(oneSided, "v", "g", "a", "b"))
    ok("kuiperTest/1side")(StatsOps.kuiperTest(oneSided, "v", "g", "a", "b"))
    ok("moodScaleTest/1side")(
      StatsOps.moodScaleTest(oneSided, "v", "g", "a", "b"))
  }

  test("round-14 survival/eval operators survive empty input") {
    ok("rmst")(StatsOps.rmst(emptyUnits, "dur", "ev", tau = 30L))
    ok("cumulativeIncidence")(StatsOps.cumulativeIncidence(
      Seq.empty[(Long, Option[String])].toDF("dur", "cause"),
      "dur", "cause"))
    ok("brierDecomposition")(EvalOps.brierDecomposition(
      Seq.empty[(Double, Boolean)].toDF("p", "y"), "p", "y"))
  }

  test("round-14 temporal operators survive empty input") {
    ok("ljungBox")(TemporalOps.ljungBox(emptyTs, "ts", 3))
    ok("kpssTest")(TemporalOps.kpssTest(emptyTs, "ts", 2))
    ok("dominantCycle")(TemporalOps.dominantCycle(emptyTs, "ts", 7))
    ok("spectralEntropy")(TemporalOps.spectralEntropy(emptyTs, "ts", 7))
    ok("chatterjeeXi")(TemporalOps.chatterjeeXi(emptyTs, "ts", "v"))
    ok("runsTest")(TemporalOps.runsTest(emptyTs, "ts", "v"))
    ok("poissonRateTest")(TemporalOps.poissonRateTest(emptyTs, "ts"))
    ok("markovStationary")(TemporalOps.markovStationary(
      Seq.empty[(Long, java.sql.Timestamp, Long, String)]
        .toDF("u", "ts", "tie", "e"), "u", "ts", "tie", "e"))
    ok("readabilityScores")(graft.ext.TextOps.readabilityScores(
      Seq.empty[(Long, String)].toDF("id", "text"), "id", "text"))
    ok("docTtr")(graft.ext.TextOps.docTtr(
      Seq.empty[(Long, String)].toDF("id", "text"), "id", "text"))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
