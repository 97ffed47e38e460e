package graft

import graft.ext.SamplingOps
import graft.sources.Stores
import org.apache.spark.sql.functions._

class SamplingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample: deterministic, partition-invariant, residues tile the corpus") {
    val docs = Stores.table(spark, sf0001, "documents")
    val s0 = SamplingOps.hashSample(docs, "doc_id", 10, 0)
      .select("doc_id").as[Long].collect().sorted
    // re-run and re-partitioned runs select the same rows
    SamplingOps.hashSample(docs.repartition(7), "doc_id", 10, 0)
      .select("doc_id").as[Long].collect().sorted shouldBe s0
    // all residues together reproduce the corpus exactly once
    val union = (0 until 10).map(r =>
      SamplingOps.hashSample(docs, "doc_id", 10, r).count()).sum
    union shouldBe docs.count()
    // roughly uniform (60-bit hash mod 10 on 100 docs)
    s0.length.toDouble shouldBe (docs.count() / 10.0) +- (docs.count() / 4.0)
  }

  test("assignSplits: total partition, stable under corpus growth") {
    val docs = Stores.table(spark, sf0001, "documents")
    val splits = SamplingOps.assignSplits(docs, "doc_id",
      Seq(("train", 80), ("val", 10), ("test", 10)))
    splits.filter(col("split").isNull).count() shouldBe 0L
    splits.count() shouldBe docs.count()
    // growth stability: assignments computed on a subset agree with the full corpus
    val subset = SamplingOps.assignSplits(docs.filter(col("doc_id") < 50),
      "doc_id", Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = splits.filter(col("doc_id") < 50)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    subset shouldBe full
  }

  test("stratifiedSample: per-stratum rates, subset of corpus, stable under growth") {
    val docs = Stores.table(spark, sf0001, "documents")
    val rates = Map("en" -> 10, "de" -> 50)
    val sampled = SamplingOps.stratifiedSample(docs, "doc_id", "lang", rates)
    // rates bite per stratum: en is downsampled harder than de; unlisted
    // langs keep everything
    val kept = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    kept("en").toDouble / total("en") should be < 0.25
    kept("de").toDouble / total("de") should be < 0.8
    for (l <- total.keySet -- rates.keySet) kept(l) shouldBe total(l)
    // a kept document stays kept when the corpus doubles (determinism —
    // membership is a pure function of the key)
    val grown = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val keptIds = sampled.select("doc_id").as[Long].collect().toSet
    val grownKept = SamplingOps.stratifiedSample(grown, "doc_id", "lang", rates)
      .filter(col("doc_id") < 1000000L).select("doc_id").as[Long].collect().toSet
    grownKept shouldBe keptIds
    // raising a stratum's rate only ADDS documents (bucket < 10 ⇒ < 50):
    // re-weighting never churns the kept set, it grows or shrinks it
    val keptAt50 = SamplingOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 50)).filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    val keptAt10 = SamplingOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 10)).filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    keptAt10.subsetOf(keptAt50) shouldBe true
  }

  test("mixProportions: binding stratum kept whole, rest downsampled pro rata, unconfigured dropped") {
    // counts: a=200, b=50, c=100; weights a:3, b:1 → binding stratum is b
    // (50/1 < 200/3); b keeps 100%, a keeps ⌊100·3·50/(1·200)⌋ = 75%
    val df = ((0 until 200).map(i => (i.toLong, "a")) ++
      (1000 until 1050).map(i => (i.toLong, "b")) ++
      (2000 until 2100).map(i => (i.toLong, "c"))).toDF("id", "s")
    val out = SamplingOps.mixProportions(df, "id", "s", Map("a" -> 3L, "b" -> 1L))
    val by = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    by.keySet shouldBe Set("a", "b") // c has no weight → dropped
    by("b") shouldBe 50L             // binding stratum kept whole
    // a is exactly the deterministic 75% stratified sample (same buckets)
    by("a") shouldBe SamplingOps.stratifiedSample(
      df.filter(col("s") === "a"), "id", "s", Map("a" -> 75)).count()
    // kept mixture approaches the 3:1 target (hash-bucket noise band)
    val ratio = by("a").toDouble / by("b")
    ratio should be >= 2.4
    ratio should be <= 3.6
    // a selected row's fate never depends on the other rows that arrived
    val out2 = SamplingOps.mixProportions(df.filter(col("s") =!= "c"),
      "id", "s", Map("a" -> 3L, "b" -> 1L))
    out2.select("id").collect().map(_.getLong(0)).sorted shouldBe
      out.select("id").collect().map(_.getLong(0)).sorted
  }

  test("selectByBudget: greedy best-quality prefix under the token budget") {
    val docs = Stores.table(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .withColumn("n_tokens", graft.ext.TextOps.tokenCount(col("text")).cast("long"))
    val selected = SamplingOps.selectByBudget(docs, "doc_id", "n_tokens",
      "n_chars", budget = 3000L)
    val rows = selected.select("doc_id", "n_chars", "n_tokens")
      .as[(Long, Long, Long)].collect()
    rows.length should be > 1
    // the selection is the TOP of the quality order: every selected doc's
    // quality ≥ every rejected doc's (modulo the key tie-break)
    val minSelQ = rows.map(_._2).min
    val rejectedBetter = docs.filter(col("n_chars") > minSelQ)
      .select("doc_id").as[Long].collect().toSet -- rows.map(_._1).toSet
    rejectedBetter shouldBe empty
    // budget respected in the prefix sense: total minus the last-admitted
    // document fits, and admitting one more would overflow
    val inOrder = rows.sortBy(r => (-r._2, r._1))
    inOrder.init.map(_._3).sum should be < 3000L
  }

  test("selectByBudgetSharded: row-identical to the exact window across budgets") {
    val docs = Stores.table(spark, sf0001, "documents")
      .filter(col("text").isNotNull)
      .withColumn("n_tokens", graft.ext.TextOps.tokenCount(col("text")).cast("long"))
    for (budget <- Seq(500L, 3000L, 20000L, 10000000L)) {
      val exact = SamplingOps.selectByBudget(docs, "doc_id", "n_tokens",
        "n_chars", budget).select("doc_id").as[Long].collect().sorted
      val sharded = SamplingOps.selectByBudgetSharded(docs, "doc_id", "n_tokens",
        "n_chars", budget, buckets = 16).select("doc_id").as[Long].collect().sorted
      sharded shouldBe exact
    }
    // degenerate single-quality corpus falls back to the exact path
    val flat = docs.withColumn("n_chars", lit(50L))
    SamplingOps.selectByBudgetSharded(flat, "doc_id", "n_tokens",
        "n_chars", 1000L, buckets = 16).count() shouldBe
      SamplingOps.selectByBudget(flat, "doc_id", "n_tokens", "n_chars", 1000L).count()

    // edge parity with the exact window:
    //  - a zero-weight row past an exactly-exhausted budget is dropped
    //  - null quality routes through the exact path instead of crashing
    val edge = Seq((1L, 10L, Some(9.0)), (2L, 0L, Some(1.0)),
        (3L, 5L, None)) // null quality
      .toDF("id", "w", "q")
    for (budget <- Seq(10L, 12L, 100L)) {
      val exact = SamplingOps.selectByBudget(edge, "id", "w", "q", budget)
        .select("id").as[Long].collect().sorted
      SamplingOps.selectByBudgetSharded(edge, "id", "w", "q", budget, buckets = 4)
        .select("id").as[Long].collect().sorted shouldBe exact
    }
    // fractional weights no longer truncate: 2×10.6 busts a budget of 21
    val frac = Seq((1L, 10.6, 3.0), (2L, 10.6, 2.0), (3L, 10.6, 1.0))
      .toDF("id", "w", "q")
    SamplingOps.selectByBudgetSharded(frac, "id", "w", "q", 21L, buckets = 4)
      .select("id").as[Long].collect().sorted shouldBe
      SamplingOps.selectByBudget(frac, "id", "w", "q", 21L)
        .select("id").as[Long].collect().sorted
  }

  test("packByBudget: packs respect the budget modulo one-document overflow") {
    val docs = Stores.table(spark, sf0001, "documents")
    val packed = SamplingOps.packByBudget(docs, "doc_id", "n_chars",
      budget = 5000L, nShards = 4)
    val packSums = packed.groupBy("shard", "pack_id")
      .agg(sum(col("n_chars")).as("w"), max(col("n_chars")).as("maxdoc"))
      .as[(Long, Long, Long, Long)].collect()
    packSums.length should be > 1
    // streaming first-fit bound: a pack exceeds the budget by less than
    // its own largest document
    packSums.foreach { case (_, _, w, maxdoc) =>
      assert(w < 5000L + maxdoc, s"pack weight $w violates budget+maxdoc bound")
    }
    // every doc packed exactly once
    packed.count() shouldBe docs.count()
  }

  test("capPerStratum: bit-identical to the window rank, deterministic, cap respected") {
    val docs = Stores.table(spark, sf0001, "documents")
    val capped = SamplingOps.capPerStratum(docs, "doc_id", "source", maxPer = 3)
    // the heap aggregation reproduces the window form exactly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(graft.ext.TextOps.fingerprint60(col("doc_id").cast("string")),
        col("doc_id"))
    val windowed = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3).drop("__rn")
    capped.orderBy("doc_id").collect() shouldBe
      windowed.orderBy("doc_id").collect()
    // cap respected per stratum; selection deterministic across runs
    capped.groupBy("source").count().agg(max("count"))
      .head().getLong(0) should be <= 3L
    SamplingOps.capPerStratum(docs.repartition(13), "doc_id", "source", 3)
      .orderBy("doc_id").collect() shouldBe capped.orderBy("doc_id").collect()
    // growth stability: capping a subset never selects rows the full
    // corpus run rejected UNLESS the subset lost the winners — verify the
    // precise form: within each stratum the kept set is the 3 smallest
    // fingerprints present
    val keptIds = capped.select("doc_id").as[Long].collect().toSet
    val expected = docs
      .select(col("source"),
        graft.ext.TextOps.fingerprint60(col("doc_id").cast("string")).as("fp"),
        col("doc_id"))
      .collect().groupBy(_.getString(0)).values.flatMap { rows =>
        rows.map(r => (r.getLong(1), r.getLong(2))).sorted.take(3).map(_._2)
      }.toSet
    keptIds shouldBe expected
  }

  test("waterfillAllocation: small strata survive whole, the head absorbs the cut; no cap when all fit") {
    // strata totals 10 / 20 / 100, budget 60: cap solves 10+20+c=60 → c=30
    val docs = (Seq.fill(1)(("s", 10L)) ++ Seq.fill(2)(("m", 10L)) ++
      Seq.fill(10)(("l", 10L))).zipWithIndex
      .map { case ((g, w), i) => (i.toLong, g, w) }
      .toDF("doc_id", "lang", "w")
    val out = SamplingOps.waterfillAllocation(docs, "lang", "w", budget = 60L)
      .orderBy("lang").as[(String, Long, Double, Boolean)].collect()
    out shouldBe Array(
      ("l", 100L, 30.0, false),
      ("m", 20L, 20.0, true),
      ("s", 10L, 10.0, true))
    // conservation: allocations spend exactly the budget when capped
    out.map(_._3).sum shouldBe 60.0
    // generous budget: everyone fully allocated, allocation = holdings
    val all = SamplingOps.waterfillAllocation(docs, "lang", "w", budget = 500L)
      .orderBy("lang").as[(String, Long, Double, Boolean)].collect()
    all shouldBe Array(
      ("l", 100L, 100.0, true), ("m", 20L, 20.0, true),
      ("s", 10L, 10.0, true))
  }

  test("lengthBuckets: power-of-two caps, exact padding accounting") {
    val docs = Seq("w", "w w", "w w w", "w w w w", "w w w w w",
      "w w w w w w w w w").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = SamplingOps.lengthBuckets(docs, "text")
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    out shouldBe Array(
      (0L, 1L, 1L, 1L, 1L, 0.0),      // len 1 pads to 1 — no waste
      (1L, 2L, 1L, 2L, 2L, 0.0),      // len 2
      (2L, 4L, 2L, 7L, 8L, 0.125),    // lens 3,4 pad to 4
      (3L, 8L, 1L, 5L, 8L, 0.375),    // len 5 pads to 8
      (4L, 16L, 1L, 9L, 16L, 0.4375)) // len 9 pads to 16
  }

  test("curriculumInterleave: strata spread proportionally through the global order") {
    // 4 'big' rows (keys .125 .375 .625 .875) merge with 2 'small' rows
    // (.25 .75) into the lattice order b s b b s b — no all-big prefix
    val docs = ((1 to 4).map(i => (i.toLong, "big")) ++
      Seq((5L, "small"), (6L, "small"))).toDF("doc_id", "lang")
    val out = SamplingOps.curriculumInterleave(docs, "doc_id", "lang")
      .orderBy("global_ord")
      .as[(Long, String, Long, Double, Long)].collect()
    out.map(_._5) shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L)
    out.map(_._2) shouldBe Array("big", "small", "big", "big", "small", "big")
    out.map(_._4) shouldBe Array(0.125, 0.25, 0.375, 0.625, 0.75, 0.875)
    // within a stratum the order is the fp60 pseudo-random rank, and the
    // whole assignment is stable under re-partitioning
    val again = SamplingOps.curriculumInterleave(docs.repartition(7),
        "doc_id", "lang")
      .orderBy("global_ord")
      .as[(Long, String, Long, Double, Long)].collect()
    again shouldBe out
  }
}
