package graft

import graft.functions.VectorAggregators.TopKByScore
import graft.plans.GraftPlanner
import org.apache.spark.sql.functions._

/** Seeded randomized properties for the round-2 components: the bounded-heap
  * top-k Aggregator's merge laws (the contract partial aggregation relies
  * on) and the custom interval join against the naive nested-loop result. */
class AggregatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  test("graft_overlap_ge: randomized sorted sets match the reference on " +
    "every (arrays, minOverlap) draw") {
    // the kernel's two-sided contract, exercised across the whole input
    // space: result ≥ 0 ⇒ exact |A∩B|; result = −1 ⇒ |A∩B| < min —
    // and the early exit can never fire on a pair that qualifies
    val rows = (1 to 300).map { _ =>
      def sortedSet(): Seq[Long] = {
        val n = rng.nextInt(40)
        Seq.fill(n)(rng.nextInt(60).toLong).distinct.sorted
      }
      val (a, b) = (sortedSet(), sortedSet())
      val min = rng.nextInt(12).toLong - 2 // includes ≤ 0 and > |A∩B|
      (a, b, min)
    }
    val got = rows.toDF("a", "b", "m")
      .select(graft.functions.OverlapGeCount(
        col("a"), col("b"), col("m")).as("c"))
      .as[Long].collect()
    rows.zip(got).zipWithIndex.foreach { case (((a, b, min), c), i) =>
      val exact = a.toSet.intersect(b.toSet).size.toLong
      withClue(s"case $i (|A∩B|=$exact, min=$min): ") {
        if (exact >= min) c shouldBe exact else c shouldBe -1L
      }
    }
  }

  test("TopKByScore: any split/merge order yields exactly sorted-take-k") {
    val agg = new TopKByScore(5)
    (1 to 25).foreach { trial =>
      val n = 1 + rng.nextInt(200)
      val items = Seq.fill(n)((rng.nextInt(20).toDouble / 4.0, rng.nextLong() % 1000))
      val expected = items.sorted(Ordering.by((t: (Double, Long)) => (-t._1, t._2))).take(5)

      // random partitioning into 1..6 "partitions", each reduced, then merged
      val parts = items.groupBy(_ => rng.nextInt(1 + rng.nextInt(6))).values.toSeq
      val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val mergedLtr = partials.foldLeft(agg.zero)(agg.merge)
      agg.finish(mergedLtr) shouldBe expected
      // merge in reversed order — same answer (commutativity across buffers)
      val mergedRtl = partials.reverse.foldLeft(agg.zero)(agg.merge)
      agg.finish(mergedRtl) shouldBe expected
    }
  }

  test("KmvSetSketch: any split/merge order, with duplicates, equals distinct-sorted-take-k") {
    val agg = new graft.functions.VectorAggregators.KmvSetSketch(8)
    (1 to 25).foreach { trial =>
      val n = 1 + rng.nextInt(300)
      // small value domain → plenty of duplicates across partitions
      val items = Seq.fill(n)(rng.nextLong() % 40)
      val expected = items.distinct.sorted.take(8)
      val parts = items.groupBy(_ => rng.nextInt(1 + rng.nextInt(6))).values.toSeq
      val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      agg.finish(partials.foldLeft(agg.zero)(agg.merge)) shouldBe expected
      agg.finish(partials.reverse.foldLeft(agg.zero)(agg.merge)) shouldBe expected
      // idempotence: re-merging an already-included partial is a no-op
      val full = partials.foldLeft(agg.zero)(agg.merge)
      agg.finish(agg.merge(full, partials.head)) shouldBe expected
    }
  }

  test("IntervalJoinExec equals the naive O(n·m) join on random intervals") {
    GraftPlanner.register(spark)
    (1 to 3).foreach { trial =>
      val base = 1700000000000L
      val pts = Seq.fill(300)((rng.nextLong() % 10000,
        new java.sql.Timestamp(base + rng.nextInt(1000000))))
        .toDF("pid", "pts")
      val iv = Seq.fill(40) {
        val s = base + rng.nextInt(1000000)
        (rng.nextLong() % 10000, new java.sql.Timestamp(s),
          new java.sql.Timestamp(s + rng.nextInt(200000)))
      }.toDF("iid", "s", "e")

      val fast = pts.join(iv, col("pts") >= col("s") && col("pts") <= col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      fast.length should be > 0

      // naive reference computed driver-side from the same data
      val p = pts.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime))
      val v = iv.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime))
      val naive = (for {
        (pid, t) <- p
        (iid, s, e) <- v
        if t >= s && t <= e
      } yield (pid, iid)).sorted
      fast shouldBe naive
    }
  }
}
