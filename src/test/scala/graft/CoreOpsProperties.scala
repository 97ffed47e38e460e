package graft

import graft.ops.CoreOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/**
 * Property-based invariants (SURVEY.md §5): upsert idempotency, merge key
 * algebra, normalization idempotency, half-open window semantics. Small
 * generated frames through the shared session; case count tuned down —
 * each case is a real Spark job.
 */
object CoreOpsProperties extends Properties("CoreOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen: Gen[(Long, String, Double)] = for {
    id <- Gen.chooseNum(0L, 20L)
    s <- Gen.alphaStr.map(_.take(6))
    v <- Gen.chooseNum(-1000.0, 1000.0)
  } yield (id, s, v)

  private val frameGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(12, rowGen).map(rows =>
      rows.groupBy(_._1).map(_._2.head).toList) // unique per key

  property("upsert is idempotent: upsert(upsert(t,u),u) == upsert(t,u)") =
    forAll(frameGen, frameGen) { (t, u) =>
      val target = t.toDF("id", "s", "v")
      val updates = u.toDF("id", "s", "v")
      val once = CoreOps.upsert(target, updates, "id", Seq("v"))
        .orderBy("id").collect().toSeq
      val twice = CoreOps.upsert(
        CoreOps.upsert(target, updates, "id", Seq("v")), updates, "id", Seq("v"))
        .orderBy("id").collect().toSeq
      Prop(once == twice) :| s"once=$once twice=$twice"
    }

  property("upsert key set = target keys ∪ update keys") =
    forAll(frameGen, frameGen) { (t, u) =>
      val merged = CoreOps.upsert(t.toDF("id", "s", "v"), u.toDF("id", "s", "v"),
        "id", Seq("v"))
      val keys = merged.select("id").as[Long].collect().toSet
      Prop(keys == (t.map(_._1).toSet ++ u.map(_._1).toSet))
    }

  property("upsert never changes non-update columns of existing target keys") =
    forAll(frameGen, frameGen) { (t, u) =>
      val merged = CoreOps.upsert(t.toDF("id", "s", "v"), u.toDF("id", "s", "v"),
        "id", Seq("v"))
      val mergedS = merged.select("id", "s").as[(Long, String)].collect().toMap
      Prop(t.forall { case (id, s, _) => mergedS(id) == s })
    }

  property("normalizeColumns is idempotent") =
    forAll(Gen.listOfN(3, Gen.identifier.map(_.take(8)))) { names0 =>
      val names = names0.zipWithIndex.map { case (n, i) => s" $n$i X" }
      val df = Seq((1, 2, 3)).toDF(names: _*)
      val once = CoreOps.normalizeColumns(df).columns.toSeq
      val twice = CoreOps.normalizeColumns(CoreOps.normalizeColumns(df)).columns.toSeq
      Prop(once == twice && once.forall(c => c == c.trim.toLowerCase))
    }

  property("windowPredicate is half-open: start included, end excluded") =
    forAll(Gen.chooseNum(0L, 86400L * 30)) { offsetS =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ts = new java.sql.Timestamp(base + offsetS * 1000)
      val df = Seq(Tuple1(ts)).toDF("ts")
      val start = "2024-01-10 00:00:00"
      val end = "2024-01-20 00:00:00"
      val kept = df.filter(CoreOps.windowPredicate(Seq("ts"), start, end)).count() == 1
      val s = java.sql.Timestamp.valueOf(start)
      val e = java.sql.Timestamp.valueOf(end)
      val expected = !ts.before(s) && ts.before(e)
      Prop(kept == expected) :| s"ts=$ts kept=$kept expected=$expected"
    }

  private val strataGen: Gen[List[(String, Long)]] = for {
    k <- Gen.chooseNum(1, 6)
    sizes <- Gen.listOfN(k, Gen.chooseNum(1L, 200L))
  } yield sizes.zipWithIndex.map { case (w, i) => (s"s$i", w) }

  property("waterfillAllocation: feasible, fair, budget-exhausting") =
    forAll(strataGen, Gen.chooseNum(1L, 800L)) { (strata, budget) =>
      val rows = strata.zipWithIndex.map { case ((g, w), i) => (i.toLong, g, w) }
      val out = graft.ext.SamplingOps
        .waterfillAllocation(rows.toDF("id", "g", "w"), "g", "w", budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3)))
      val totals = strata.toMap
      val spendEach = out.map(_._3)
      val feasible = out.forall { case (g, t, a, _) =>
        t == totals(g) && a >= 0.0 && a <= t + 1e-6 }
      // allocations spend min(budget, ΣT) within the 6dp cap rounding
      val spent = spendEach.sum
      val want = math.min(budget.toDouble, totals.values.sum.toDouble)
      val exhaustive = math.abs(spent - want) <= 1e-4 * out.length
      // max-min fairness: every capped stratum gets ≥ any full stratum's
      // holding (the water level never sits below a fully-kept stratum)
      val caps = out.filter(!_._4).map(_._3)
      val fulls = out.filter(_._4).map(_._3)
      val fair = caps.isEmpty || fulls.isEmpty || caps.min >= fulls.max - 1e-6
      Prop(feasible && exhaustive && fair) :|
        s"out=${out.toList} budget=$budget spent=$spent want=$want"
    }

  // words chosen to hit every lang family, the CJK override, non-matches,
  // and the empty token that split(' ', -1) keeps for doubled spaces
  private val langWordGen: Gen[String] = Gen.oneOf(
    "the", "and", "el", "la", "le", "est", "der", "und", "ist", "y",
    "世界", "中文x", "zzz", "word", "", "a.b", "UPPER")

  private val langTextGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 25)
    ws <- Gen.listOfN(n, langWordGen)
  } yield ws.mkString(" ")

  property("SegmentLangIds kernel ≡ expression tree on random code-switched text") =
    forAll(Gen.listOfN(8, langTextGen), Gen.chooseNum(1, 7)) {
      (texts, segWords) =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
        val hof = graft.ext.TextOps
          .segmentLangIdsHof(df, "id", "text", segWords)
          .orderBy("id").as[(Long, Seq[String])].collect().toSeq
        val kern = df
          .select(col("id"),
            graft.functions.SegmentLangIds(col("text"), segWords)
              .as("labels"))
          .orderBy("id").as[(Long, Seq[String])].collect().toSeq
        Prop(kern == hof) :| s"segWords=$segWords kern=$kern hof=$hof"
    }
}
