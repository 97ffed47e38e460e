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
}
