package graft

import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, ShardOps, StatsOps}
import graft.ext.TextOps

/** bfsHops, weightedQuartiles, zOrderKey, jsDivergence — the layout &
  * distance wave. */
class LayoutAndDistanceSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- BFS

  test("bfsHops: exact hop counts on a path, isolated seed kept at 0") {
    // path 1-2-3-4-5, noise (dup/reversed/self-loop), seed 9 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (3L, 3L)).toDF("s", "t")
    val seeds = Seq(1L, 9L).toDF("node")
    val got = GraphOps.bfsHops(edges, "s", "t", seeds, "node", rounds = 4)
      .orderBy("node").as[(Long, Long)].collect()
    got shouldBe Array((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (9L, 0L))
  }

  test("bfsHops: rounds bound the radius; unreached nodes are absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "t")
    val got = GraphOps.bfsHops(edges, "s", "t",
        Seq(1L).toDF("node"), "node", rounds = 2)
      .orderBy("node").as[(Long, Long)].collect()
    got shouldBe Array((1L, 0L), (2L, 1L), (3L, 2L))
  }

  test("bfsHops: multi-source takes the MIN hop over all seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "t")
    val got = GraphOps.bfsHops(edges, "s", "t",
        Seq(1L, 5L).toDF("node"), "node", rounds = 4)
      .orderBy("node").as[(Long, Long)].collect()
    got shouldBe Array((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 0L))
  }

  // -------------------------------------------- weighted quartiles

  test("weightedQuartiles: crossings follow cumulative weight, not rows") {
    // g: values 1,2,3,4 with weights 1,1,1,7 → total 10; the heavy tail
    // value owns every crossing past 30% cumulative weight
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 1L),
      ("g", 4.0, 7L)).toDF("grp", "v", "w")
    val r = StatsOps.weightedQuartiles(df, "grp", "v", "w").head()
    r.getAs[Long]("total_weight") shouldBe 10L
    r.getAs[Double]("w_q1") shouldBe 3.0     // cw 3 ≥ 10/4
    r.getAs[Double]("w_median") shouldBe 4.0 // cw 10 ≥ 10/2 first at v=4
    r.getAs[Double]("w_q3") shouldBe 4.0
  }

  test("weightedQuartiles: unit weights reduce to the lower median") {
    val df = (1 to 9).map(i => ("g", i.toDouble, 1L)).toDF("grp", "v", "w")
    val r = StatsOps.weightedQuartiles(df, "grp", "v", "w").head()
    r.getAs[Double]("w_q1") shouldBe 3.0     // ceil(9/4) = 3rd value
    r.getAs[Double]("w_median") shouldBe 5.0
    r.getAs[Double]("w_q3") shouldBe 7.0     // ceil(27/4) = 7th value
  }

  test("weightedQuartiles: null and non-positive weights are excluded") {
    val df = Seq(("g", 1.0, Some(0L)), ("g", 2.0, None),
      ("g", 5.0, Some(3L))).toDF("grp", "v", "w")
    val r = StatsOps.weightedQuartiles(df, "grp", "v", "w").head()
    r.getAs[Long]("total_weight") shouldBe 3L
    r.getAs[Double]("w_median") shouldBe 5.0
  }

  // ------------------------------------------------------ z-order key

  test("zOrderKey: matches a bit-interleave reference on random inputs") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ShardOps.zOrderKey(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => z shouldBe ref(x, y, 16) }
  }

  test("zOrderKey: a shared key prefix bounds BOTH dimensions (box)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val cells = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        shiftright(ShardOps.zOrderKey(col("x"), col("y"), 16), 16)
          .as("cell"))
      .groupBy("cell")
      .agg(min("x").as("xlo"), max("x").as("xhi"),
        min("y").as("ylo"), max("y").as("yhi"))
      .as[(Long, Long, Long, Long, Long)].collect()
    // dropping 16 interleaved bits leaves the top 8 bits of each dim:
    // every cell is one 256×256 box — min/max stay inside it
    cells.foreach { case (_, xlo, xhi, ylo, yhi) =>
      (xhi >> 8) shouldBe (xlo >> 8)
      (yhi >> 8) shouldBe (ylo >> 8)
    }
  }

  test("zOrderKey: inputs beyond the mask wrap (documented contract)") {
    val z = Seq((65536L + 5L, 3L)).toDF("x", "y")
      .select(ShardOps.zOrderKey(col("x"), col("y"), 16).as("z"))
      .as[Long].head()
    val z5 = Seq((5L, 3L)).toDF("x", "y")
      .select(ShardOps.zOrderKey(col("x"), col("y"), 16).as("z"))
      .as[Long].head()
    z shouldBe z5
  }

  // -------------------------------------------------- JS divergence

  test("jsDivergence: identical slices diverge by zero") {
    val df = Seq(("a", "x y z"), ("b", "x y z")).toDF("g", "text")
    val r = TextOps.jsDivergence(df, "text", "g", "a", "b").head()
    r.getAs[Double]("jsd_nats") shouldBe 0.0
    r.getAs[Long]("vocab") shouldBe 3L
  }

  test("jsDivergence: disjoint vocabularies hit the ln 2 ceiling") {
    val df = Seq(("a", "x x y"), ("b", "p q q")).toDF("g", "text")
    val r = TextOps.jsDivergence(df, "text", "g", "a", "b").head()
    r.getAs[Double]("jsd_nats") shouldBe (math.log(2.0) +- 1e-6)
    r.getAs[Long]("vocab_a") shouldBe 2L
    r.getAs[Long]("vocab_b") shouldBe 2L
    r.getAs[Long]("vocab") shouldBe 4L
  }

  test("jsDivergence: symmetric in its two slices") {
    val df = Seq(("a", "x y y z"), ("b", "x x q")).toDF("g", "text")
    val ab = TextOps.jsDivergence(df, "text", "g", "a", "b").head()
    val ba = TextOps.jsDivergence(df, "text", "g", "b", "a").head()
    ab.getAs[Double]("jsd_nats") shouldBe ba.getAs[Double]("jsd_nats")
    ab.getAs[Long]("n_a") shouldBe ba.getAs[Long]("n_b")
  }

  test("jsDivergence: an empty slice emits no row, never NaN") {
    val df = Seq(("a", "x y")).toDF("g", "text")
    TextOps.jsDivergence(df, "text", "g", "a", "b").count() shouldBe 0L
  }
}
