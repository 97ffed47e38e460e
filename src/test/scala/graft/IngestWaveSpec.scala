package graft

import java.nio.file.Files
import graft.ext.{AnnIndexStore, ClusterStore, DedupOps, IngestOps,
  LexIndexStore, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/**
 * The batch ingest wave's contract: the admission report is exact, and
 * EVERY persisted artifact the wave advances (corpus, band index, cluster
 * assignment, ANN cells, BM25 postings) ends up identical to a batch
 * rebuild over (base ∪ admitted) — the batch-side extension of
 * StreamingPipelineSpec's `dedupAnnIngest` lockstep proof.
 */
class IngestWaveSpec extends SparkSpec {
  import spark.implicits._

  test("ingestWave: report exact; clusters/ANN/lex equal batch rebuilds over base ∪ admitted") {
    val work = Files.createTempDirectory("graft_wave_").toString
    val st = IngestOps.WaveStores(s"$work/corpus", s"$work/bandidx",
      s"$work/clusters", s"$work/ann", s"$work/lex", s"$work/report")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))

    // base corpus (admitted as-is): two near-dup docs so the base cluster
    // store is non-trivial
    val baseTxt = "the quick brown fox jumps over the lazy dog today"
    val base = Seq(
      (10L, baseTxt, Seq(0.9f, 0.1f, 0f, 0f)),
      (11L, baseTxt, Seq(0.8f, 0.2f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding")
    base.drop("embedding").write.parquet(s"${st.corpusPath}/wave=0")
    DedupOps.bandIndex(base, "doc_id", "text", n = 3, numHashes = 16,
        bands = 4)
      .write.parquet(s"${st.bandIndexPath}/wave=0")
    ClusterStore.build(st.clusterPath,
      DedupOps.minhashDedupPairs(base, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.9))
    AnnIndexStore.save(st.annPath, base, "doc_id", "embedding", cents)
    LexIndexStore.build(st.lexPath, base, "doc_id", "text", nBuckets = 8)

    // the wave: one per disposition (plus a second admit)
    val txt102 = "alpha beta gamma delta epsilon the zeta omega kappa iota"
    val wave = Seq(
      (101L, "xx", Seq(0.5f, 0.5f, 0f, 0f)),       // fails the gate
      (102L, txt102, Seq(0.1f, 0.9f, 0f, 0f)),      // admitted
      (103L, txt102, Seq(0.2f, 0.8f, 0f, 0f)),      // in-batch dup of 102
      (104L, baseTxt, Seq(0.7f, 0.3f, 0f, 0f)),     // dup of the corpus
      (105L, "one mango two melon three apple four grape the banana",
        Seq(0.6f, 0.6f, 0f, 0f)),                   // admitted
      (106L, null.asInstanceOf[String],
        Seq(0.4f, 0.6f, 0f, 0f)))                   // null text: no admission
      .toDF("doc_id", "text", "embedding")

    val report = IngestOps.ingestWave(spark, wave, "doc_id", "text",
      "embedding", st, waveId = 1,
      n = 3, numHashes = 16, bands = 4, threshold = 0.9,
      minTokens = 5, maxTokens = 80, minStopHits = 1)

    // ---- the report: every wave doc exactly once, dispositions exact ----
    report.orderBy("doc_id").as[(Long, String)].collect() shouldBe Array(
      (101L, "rejected_quality"),
      (102L, "admitted"),
      (103L, "rejected_batch_dup"),
      (104L, "rejected_corpus_dup"),
      (105L, "admitted"),
      (106L, "rejected_quality")) // no text, no admission — never an NPE

    // ---- corpus + band index advanced with exactly the admitted set ----
    val corpusIds = spark.read.parquet(st.corpusPath)
      .select("doc_id").as[Long].collect().sorted
    corpusIds shouldBe Array(10L, 11L, 102L, 105L)
    spark.read.parquet(st.bandIndexPath).select("id").distinct()
      .as[Long].collect().sorted shouldBe Array(10L, 11L, 102L, 105L)

    // ---- cluster store equals a fresh build over ALL dup evidence ----
    // (base pairs ∪ in-batch pairs ∪ batch×corpus pairs — rejected docs
    // included: the takedown consumers need the whole component)
    val rebuilt = s"$work/clusters_rebuilt"
    ClusterStore.build(rebuilt, ClusterStore.pairs(spark, st.clusterPath))
    val gotAsg = ClusterStore.assignment(spark, st.clusterPath)
      .orderBy("id").as[(Long, Long)].collect()
    val wantAsg = ClusterStore.assignment(spark, rebuilt)
      .orderBy("id").as[(Long, Long)].collect()
    gotAsg shouldBe wantAsg
    gotAsg.toMap.apply(104L) shouldBe 10L  // joined the corpus-dup cluster
    gotAsg.toMap.apply(103L) shouldBe 102L // joined the in-batch cluster
    // the evidence edge set is exactly the three families
    ClusterStore.pairs(spark, st.clusterPath)
      .select("id1", "id2").as[(Long, Long)].collect().sorted shouldBe
      Array((10L, 11L), (10L, 104L), (11L, 104L), (102L, 103L))

    // ---- ANN cells equal a batch build over base ∪ admitted ----
    val admitted = wave.filter(col("doc_id").isin(102L, 105L))
    val gotCells = spark.read.parquet(s"${st.annPath}/cells")
      .select(col("doc_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)].collect().sorted
    val wantCells = SimilarityOps.ivfAssign(
        base.unionByName(admitted), cents, "doc_id", "embedding")
      .select(col("doc_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)].collect().sorted
    gotCells shouldBe wantCells
    gotCells.map(_._1) should not contain 103L

    // ---- BM25 postings equal the batch operator over base ∪ admitted ----
    val allText = base.drop("embedding")
      .unionByName(admitted.drop("embedding"))
    val qt = allText.select(col("doc_id").as("qid"),
      explode(array_distinct(slice(TextOps.tokens(col("text")), 1, 4)))
        .as("term"))
    val lexGot = LexIndexStore.topK(spark, st.lexPath, qt, k = 3)
      .orderBy("qid", "rnk")
    lexGot.collect() shouldBe
      TextOps.bm25BatchTopK(allText, "doc_id", "text", qt, k = 3)
        .orderBy("qid", "rnk").collect()
    lexGot.select("doc_id").as[Long].collect() should not contain 104L
  }

  test("ingestWave sequencing: wave 2 dedups against wave 1's admissions and artifacts accrete") {
    val work = Files.createTempDirectory("graft_wave_seq_").toString
    val st = IngestOps.WaveStores(s"$work/corpus", s"$work/bandidx",
      s"$work/clusters", s"$work/ann", s"$work/lex", s"$work/report")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    val base = Seq((10L, "the solid base document with plenty words here",
      Seq(0.9f, 0.1f, 0f, 0f))).toDF("doc_id", "text", "embedding")
    base.drop("embedding").write.parquet(s"${st.corpusPath}/wave=0")
    DedupOps.bandIndex(base, "doc_id", "text", 3, 16, 4)
      .write.parquet(s"${st.bandIndexPath}/wave=0")
    ClusterStore.build(st.clusterPath, Seq((9L, 10L)).toDF("id1", "id2"))
    AnnIndexStore.save(st.annPath, base, "doc_id", "embedding", cents)
    LexIndexStore.build(st.lexPath, base, "doc_id", "text", nBuckets = 8)

    val txt201 = "alpha beta gamma delta epsilon the zeta omega kappa iota"
    def run(wave: org.apache.spark.sql.DataFrame, id: Long) =
      IngestOps.ingestWave(spark, wave, "doc_id", "text", "embedding", st,
        waveId = id, n = 3, numHashes = 16, bands = 4, threshold = 0.9,
        minTokens = 5, maxTokens = 80, minStopHits = 1)
        .orderBy("doc_id").as[(Long, String)].collect()

    run(Seq((201L, txt201, Seq(0.1f, 0.9f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding"), id = 1) shouldBe
      Array((201L, "admitted"))
    // wave 2: a dup of wave 1's admission must now be a CORPUS dup —
    // wave 1's band-index contribution is live for wave 2's probe
    val w2 = run(Seq(
      (301L, txt201, Seq(0.2f, 0.8f, 0f, 0f)),
      (302L, "one mango two melon three apple four grape the banana",
        Seq(0.6f, 0.6f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding"), id = 2)
    w2 shouldBe Array(
      (301L, "rejected_corpus_dup"), (302L, "admitted"))
    // artifacts accreted across waves: corpus = base ∪ both admissions,
    // cluster evidence carries the cross-wave dup edge, ANN/lex likewise
    spark.read.parquet(st.corpusPath).select("doc_id")
      .as[Long].collect().sorted shouldBe Array(10L, 201L, 302L)
    ClusterStore.pairs(spark, st.clusterPath)
      .select("id1", "id2").as[(Long, Long)].collect().sorted should
      contain ((201L, 301L))
    ClusterStore.assignment(spark, st.clusterPath)
      .orderBy("id").as[(Long, Long)].collect().toMap
      .apply(301L) shouldBe 201L
    spark.read.parquet(s"${st.annPath}/cells").select("doc_id")
      .as[Long].collect().sorted shouldBe Array(10L, 201L, 302L)
  }

  test("compactWaves folds wave dirs into one; admission decisions are unchanged after") {
    val work = Files.createTempDirectory("graft_wave_compact_").toString
    val st = IngestOps.WaveStores(s"$work/corpus", s"$work/bandidx",
      s"$work/clusters", s"$work/ann", s"$work/lex", s"$work/report")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    val base = Seq((10L, "the solid base document with plenty words here",
      Seq(0.9f, 0.1f, 0f, 0f))).toDF("doc_id", "text", "embedding")
    base.drop("embedding").write.parquet(s"${st.corpusPath}/wave=0")
    DedupOps.bandIndex(base, "doc_id", "text", 3, 16, 4)
      .write.parquet(s"${st.bandIndexPath}/wave=0")
    ClusterStore.build(st.clusterPath, Seq((9L, 10L)).toDF("id1", "id2"))
    AnnIndexStore.save(st.annPath, base, "doc_id", "embedding", cents)
    LexIndexStore.build(st.lexPath, base, "doc_id", "text", nBuckets = 8)

    val txt201 = "alpha beta gamma delta epsilon the zeta omega kappa iota"
    def run(wave: org.apache.spark.sql.DataFrame, id: Long) =
      IngestOps.ingestWave(spark, wave, "doc_id", "text", "embedding", st,
        waveId = id, n = 3, numHashes = 16, bands = 4, threshold = 0.9,
        minTokens = 5, maxTokens = 80, minStopHits = 1)
        .orderBy("doc_id").as[(Long, String)].collect()

    run(Seq((201L, txt201, Seq(0.1f, 0.9f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding"), id = 1)
    val corpusBefore = spark.read.parquet(st.corpusPath)
      .select("doc_id").as[Long].collect().sorted
    val idxBefore = spark.read.parquet(st.bandIndexPath)
      .select("band_key", "id").as[(String, Long)].collect().sorted

    IngestOps.compactWaves(spark, st.corpusPath)
    IngestOps.compactWaves(spark, st.bandIndexPath)

    // contents byte-equal (modulo the retired wave column), ONE wave dir
    spark.read.parquet(st.corpusPath).select("doc_id")
      .as[Long].collect().sorted shouldBe corpusBefore
    spark.read.parquet(st.bandIndexPath).select("band_key", "id")
      .as[(String, Long)].collect().sorted shouldBe idxBefore
    val waves = new java.io.File(st.corpusPath).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    waves shouldBe Array("wave=0")

    // the compacted index still rejects a dup of the folded admission,
    // and a fresh wave id appends cleanly beside wave=0
    run(Seq(
      (301L, txt201, Seq(0.2f, 0.8f, 0f, 0f)),
      (302L, "one mango two melon three apple four grape the banana",
        Seq(0.6f, 0.6f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding"), id = 2) shouldBe Array(
      (301L, "rejected_corpus_dup"), (302L, "admitted"))
    spark.read.parquet(st.corpusPath).select("doc_id")
      .as[Long].collect().sorted shouldBe Array(10L, 201L, 302L)
  }

  test("ingestWave semantic gate: a cosine near-dup of an admitted embedding is rejected; no-vector docs skip the gate") {
    import graft.ext.SimilarityOps
    val work = Files.createTempDirectory("graft_wave_sem_").toString
    val st = IngestOps.WaveStores(s"$work/corpus", s"$work/bandidx",
      s"$work/clusters", s"$work/ann", s"$work/lex", s"$work/report")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    val base = Seq((10L, "the solid base document with plenty words here",
      Seq(0.9f, 0.1f, 0f, 0f))).toDF("doc_id", "text", "embedding")
    base.drop("embedding").write.parquet(s"${st.corpusPath}/wave=0")
    DedupOps.bandIndex(base, "doc_id", "text", 3, 16, 4)
      .write.parquet(s"${st.bandIndexPath}/wave=0")
    ClusterStore.build(st.clusterPath, Seq((9L, 10L)).toDF("id1", "id2"))
    AnnIndexStore.save(st.annPath, base, "doc_id", "embedding", cents)
    LexIndexStore.build(st.lexPath, base, "doc_id", "text", nBuckets = 8)

    val wave = Seq(
      // different TEXT (passes every lexical gate) but near-identical
      // embedding to the admitted base doc → semantic rejection
      (501L, "alpha beta gamma delta epsilon the zeta omega kappa iota",
        Some(Seq(0.89f, 0.11f, 0f, 0f))),
      // different text AND far embedding → admitted
      (502L, "one mango two melon three apple four grape the banana",
        Some(Seq(-0.5f, 0.5f, 0f, 0f))),
      // no embedding at all: the gate cannot apply — admitted
      (503L, "this third unique sentence has the right shape to pass",
        None: Option[Seq[Float]]))
      .toDF("doc_id", "text", "embedding")
    val report = IngestOps.ingestWave(spark, wave, "doc_id", "text",
      "embedding", st, waveId = 1, n = 3, numHashes = 16, bands = 4,
      threshold = 0.9, minTokens = 5, maxTokens = 80, minStopHits = 1,
      // stride 1 keeps the sign-LSH probe inside the 4-dim test vectors
      semanticThreshold = Some(0.9), nBits = 4, stride = 1)
      .orderBy("doc_id").as[(Long, String)].collect()
    report shouldBe Array(
      (501L, "rejected_semantic_dup"),
      (502L, "admitted"),
      (503L, "admitted"))
    // the rejected embedding never became searchable; the admitted did
    spark.read.parquet(s"${st.annPath}/cells").select("doc_id")
      .as[Long].collect().sorted shouldBe Array(10L, 502L)
    // sanity: the gate's verdict matches the standalone incremental op
    SimilarityOps.cosineNearDupPairsIncremental(
        wave.filter(col("embedding").isNotNull), base,
        "doc_id", "embedding", threshold = 0.9, nBits = 4, stride = 1)
      .select("new_id").as[Long].collect() shouldBe Array(501L)
  }

  test("ingestWave replay: re-running the same wave id leaves every artifact unchanged") {
    val work = Files.createTempDirectory("graft_wave_replay_").toString
    val st = IngestOps.WaveStores(s"$work/corpus", s"$work/bandidx",
      s"$work/clusters", s"$work/ann", s"$work/lex", s"$work/report")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    val base = Seq((10L, "the solid base document with plenty words here",
      Seq(0.9f, 0.1f, 0f, 0f))).toDF("doc_id", "text", "embedding")
    base.drop("embedding").write.parquet(s"${st.corpusPath}/wave=0")
    DedupOps.bandIndex(base, "doc_id", "text", 3, 16, 4)
      .write.parquet(s"${st.bandIndexPath}/wave=0")
    // base store needs ≥1 edge (nodes need not be corpus docs)
    ClusterStore.build(st.clusterPath,
      Seq((9L, 10L)).toDF("id1", "id2"))
    AnnIndexStore.save(st.annPath, base, "doc_id", "embedding", cents)
    LexIndexStore.build(st.lexPath, base, "doc_id", "text", nBuckets = 8)

    val wave = Seq(
      (201L, "alpha beta gamma delta epsilon the zeta omega kappa iota",
        Seq(0.1f, 0.9f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding")
    def run() = IngestOps.ingestWave(spark, wave, "doc_id", "text",
      "embedding", st, waveId = 1, n = 3, numHashes = 16, bands = 4,
      threshold = 0.9, minTokens = 5, maxTokens = 80, minStopHits = 1)
      .orderBy("doc_id").as[(Long, String)].collect()

    val first = run()
    val corpus1 = spark.read.parquet(st.corpusPath)
      .select("doc_id").as[Long].collect().sorted
    val cells1 = spark.read.parquet(s"${st.annPath}/cells")
      .select(col("doc_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)].collect().sorted
    // at-least-once redelivery: same wave id overwrites itself everywhere
    val second = run()
    second shouldBe first
    spark.read.parquet(st.corpusPath).select("doc_id")
      .as[Long].collect().sorted shouldBe corpus1
    spark.read.parquet(s"${st.annPath}/cells")
      .select(col("doc_id").cast("long"), col("cell").cast("long"))
      .as[(Long, Long)].collect().sorted shouldBe cells1
  }
}
