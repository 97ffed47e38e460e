package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The BATCH ingest wave — the production admission path composed as ONE
 * lazy DataFrame DAG, batch-side twin of
 * [[graft.streaming.StreamingPipeline.dedupAnnIngest]] (which proves the
 * same lockstep-artifact discipline per micro-batch): a wave of candidate
 * documents flows through quality gate → in-batch near-dup rejection →
 * incremental near-dup rejection against the persisted corpus band index,
 * and then EVERY persisted artifact advances with the admitted set in one
 * wave scope — corpus rows, band index, dup-cluster assignment
 * ([[ClusterStore.append]]), ANN cells ([[AnnIndexStore.append]]) and
 * BM25 postings ([[LexIndexStore.append]]). A doc is searchable
 * (semantically AND lexically) iff it was admitted, and the cluster
 * artifact carries the evidence for every REJECTED near-dup too — the
 * takedown/leakage consumers need the whole component, not the survivors.
 *
 * Mirrors the reference pipeline's run-scoped batch discipline
 * (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:310,320` — run_id
 * isolation; here `wave=`/`b=` directory scoping), re-expressed as lazy
 * Spark plans: Catalyst sees gate → dedup → admission as one plan per
 * artifact sink, so documents' unused columns prune at the single scan
 * and nothing materializes between operators except the artifact writes.
 */
object IngestOps {

  /** Persisted artifact roots one wave advances in lockstep. */
  case class WaveStores(corpusPath: String, bandIndexPath: String,
                        clusterPath: String, annPath: String,
                        lexPath: String, reportPath: String)

  /**
   * Run one ingest wave. `batch` must carry `idCol` (globally unique vs
   * the corpus — the [[DedupOps.incrementalNearDupPairs]] contract),
   * `textCol`, and `vecCol` (the embedding for ANN growth).
   *
   * Admission semantics (each stage sees the previous stage's survivors):
   *   1. `rejected_quality` — fails [[TextOps.gopherFilter]] (null text
   *      included: no text, no admission);
   *   2. `rejected_batch_dup` — has a verified near-dup (exact n-gram
   *      Jaccard ≥ `threshold` via MinHash-LSH candidates) with a
   *      SMALLER-id gated doc in the same wave. The pair-min rule is
   *      deliberately non-recursive — admission of X must not depend on
   *      the admission cascade of its neighbors — so the report is an
   *      exactly SQL-replayable pure function of the inputs (the
   *      DuckDB-oracle gate) AND deterministic under batch re-partition;
   *   3. `rejected_corpus_dup` — near-dups an already-admitted corpus
   *      doc via the PERSISTED band index (the batch is banded once;
   *      the corpus is never re-shingled);
   *   4. `rejected_semantic_dup` — only with `semanticThreshold` set:
   *      the SemDeDup gate — 6dp cosine ≥ τ against an already-admitted
   *      embedding, candidates from the sign-LSH bucket join
   *      ([[SimilarityOps.cosineNearDupPairsIncremental]]) over the ANN
   *      store's cell rows (current wave's `b=` partition pruned, same
   *      replay discipline as the text path). Docs without an embedding
   *      skip this gate — no vector, no semantic evidence. Semantic
   *      pairs do NOT feed the lexical evidence store (different score
   *      semantics; run the SemDeDup clustering on its own store);
   *   5. `admitted` — everything else.
   *
   * Artifact writes (all scoped by `waveId`, so a replayed wave
   * overwrites itself — at-least-once redelivery stays exactly-once at
   * the directory level):
   *   - admitted rows → `corpusPath/wave=waveId`;
   *   - their band-index contribution → `bandIndexPath/wave=waveId`;
   *   - ALL verified dup evidence of the wave (in-batch pairs among
   *     gated docs + batch×corpus pairs) → [[ClusterStore.append]];
   *   - admitted embeddings → [[AnnIndexStore.append]] (batchId =
   *     waveId, against the store's frozen centroids);
   *   - admitted text → [[LexIndexStore.append]] (batchId = waveId);
   *   - the per-doc report → `reportPath/wave=waveId`.
   *
   * Returns the committed report read back from its artifact:
   * (`idCol`, disposition). Every input batch row appears exactly once.
   *
   * Scale: the wave pays O(batch) shingle/band kernels, one banded
   * self-join (in-batch) and one band-key probe of the persisted index
   * (batch side broadcasts under AQE); corpus text is read only for
   * verification candidates, column-pruned. Store appends are O(admitted)
   * — nothing here is O(corpus) except the one narrow index probe.
   */
  private val Marker = "_STORE_SUCCESS"

  /**
   * COMPACT a wave-partitioned artifact root (`corpusPath` /
   * `bandIndexPath` / `reportPath`): a long-running ingest accretes one
   * `wave=` directory per wave, and at 100 TB the FILE COUNT — not the
   * data — becomes the cost (every wave's probe lists every prior wave's
   * files). Rewrites the union of all waves into a single fresh `wave=0`
   * and swaps it in with the shared [[graft.sources.TreeSwap]] rename-
   * aside discipline (crash at any instant leaves a complete root live
   * or recoverable — [[ingestWave]] recovers on entry). Contents are
   * unchanged by construction: rows are per-doc facts independent of
   * which wave carried them.
   *
   * CONTRACT: compaction retires the folded waves' replay scope — a wave
   * id folded into `wave=0` no longer overwrites its original directory
   * on redelivery (the [[graft.ext.LexIndexStore.compact]] rule). Compact
   * only after the folded waves' delivery is settled, and issue fresh
   * wave ids afterwards.
   */
  def compactWaves(spark: SparkSession, path: String,
                   targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    graft.sources.TreeSwap.recover(spark, path, ".compact", ".precompact",
      Marker)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // mergeSchema: wave batches may have evolved additively; a sampled
    // footer would permanently drop evolved columns in the rewrite
    val df = spark.read.option("mergeSchema", "true").parquet(path)
      .drop("wave").coalesce(nFiles)
    graft.sources.TreeSwap.swap(spark, path, ".compact", ".precompact",
      Marker) { tmp => df.write.parquet(s"$tmp/wave=0") }
  }

  def ingestWave(spark: SparkSession, batch: DataFrame, idCol: String,
                 textCol: String, vecCol: String, stores: WaveStores,
                 waveId: Long,
                 n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.4,
                 minTokens: Int = 20, maxTokens: Int = 80,
                 minStopHits: Int = 2,
                 semanticThreshold: Option[Double] = None,
                 nBits: Int = 4, stride: Int = 8): DataFrame = {
    require(waveId > 0, "waveId 0 is the base build")
    // repair any crashed compaction before reading the roots it swaps
    Seq(stores.corpusPath, stores.bandIndexPath, stores.reportPath).foreach(
      graft.sources.TreeSwap.recover(spark, _, ".compact", ".precompact",
        Marker))
    // one batch scan feeds every stage — persist the (small) wave, not
    // the corpus. The gate outputs are ALSO persisted for the wave's
    // scope: the lockstep section below runs ~6 independent actions
    // (corpus write, band index, cluster append, ANN append, postings
    // append, report), and without a cut each action would re-run the
    // shingle/minhash/band/verify pipelines from scratch — measured 2-3×
    // the whole wave's cost at sf0.1, pure recomputation.
    val b = batch.persist()
    val scoped = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def scopePersist(df: DataFrame): DataFrame = { scoped += df; df.persist() }
    try {
      val gatedIds = scopePersist(TextOps.gopherFilter(b, idCol, textCol,
          minTokens = minTokens, maxTokens = maxTokens,
          minStopHits = minStopHits)
        .filter(col("keep")).select(idCol))
      val gated = b.join(gatedIds, idCol)

      // in-batch near-dup evidence: LSH candidates, exact-Jaccard verified
      val batchPairs = scopePersist(DedupOps.minhashDedupPairs(gated,
        idCol, textCol, n, numHashes, bands, threshold))
      // pair-min admission: id2 of any verified pair (id1 < id2) rejects
      val batchLosers = batchPairs.select(col("id2").as(idCol)).distinct()
      val batchKept = gated.join(batchLosers, Seq(idCol), "left_anti")

      // incremental near-dup vs the persisted corpus: band-probe + verify.
      // The CURRENT wave's partition is excluded (partition-pruned, so a
      // replay never reads the files it is about to overwrite): a
      // replayed doc must not be rejected as a near-dup of its own prior
      // admission — that would turn at-least-once redelivery into data
      // loss instead of idempotence
      val corpusIndex = spark.read.parquet(stores.bandIndexPath)
        .filter(col("wave") =!= waveId)
        .select("band_key", "id")
      val corpusText = spark.read.parquet(stores.corpusPath)
        .filter(col("wave") =!= waveId)
        .select(col(idCol), col(textCol))
      val crossPairs = scopePersist(DedupOps.incrementalNearDupPairs(
        batchKept, idCol, textCol, corpusIndex, corpusText,
        n, numHashes, bands, threshold))
      val corpusLosers = crossPairs.select(col("new_id").as(idCol)).distinct()
      val batchKept2 = batchKept.join(corpusLosers, Seq(idCol), "left_anti")

      // optional SemDeDup gate: bucket-join the survivors' embeddings
      // against the already-admitted ANN rows, exact cosine ≥ τ rejects
      val semanticLosers = semanticThreshold match {
        case Some(tau) =>
          val corpusVecs = spark.read.parquet(s"${stores.annPath}/cells")
            .filter(col("b") =!= waveId)
            .select(col(idCol), col(vecCol))
          scopePersist(SimilarityOps.cosineNearDupPairsIncremental(
              batchKept2.filter(col(vecCol).isNotNull), corpusVecs,
              idCol, vecCol, tau, nBits, stride)
            .select(col("new_id").as(idCol)).distinct())
        case None => batchKept2.select(idCol).limit(0)
      }
      val admitted = batchKept2.join(semanticLosers, Seq(idCol), "left_anti")
        .persist()

      try {
        // materialize the whole persisted admission chain with ONE action
        // before fanning out: every scoped frame (gate, pairs, losers) is
        // in `admitted`'s lineage, so this caches them all exactly once —
        // concurrent first-touch from the parallel writers below would
        // instead compute the same partitions redundantly (BlockManager
        // races are correct but wasteful)
        admitted.count()

        // ---- artifacts advance in lockstep, all wave-scoped ----
        // The six writes are pairwise independent (disjoint store dirs)
        // and the wave is replay-idempotent at the directory level
        // (IngestWaveSpec), so completion ORDER carries no recovery
        // meaning — a crash mid-fanout heals exactly like a crash
        // mid-sequence. Submitting them concurrently overlaps their job
        // scheduling/IO latency: each write is a handful of small jobs
        // over the cached frames, and the wave's wall cost is the max of
        // the six instead of the sum.
        // cluster evidence: BOTH pair families, canonical (min, max) order
        val waveEvidence = batchPairs.select("id1", "id2", "jaccard")
          .unionByName(crossPairs.select(
            least(col("new_id"), col("corpus_id")).as("id1"),
            greatest(col("new_id"), col("corpus_id")).as("id2"),
            col("jaccard")))
        // ---- per-doc admission report, the wave's audit artifact ----
        val report = b.select(col(idCol))
          .join(gatedIds.withColumn("__g", lit(1)), Seq(idCol), "left")
          .join(batchLosers.withColumn("__b", lit(1)), Seq(idCol), "left")
          .join(corpusLosers.withColumn("__c", lit(1)), Seq(idCol), "left")
          .join(semanticLosers.withColumn("__s", lit(1)), Seq(idCol), "left")
          .select(col(idCol),
            when(col("__g").isNull, "rejected_quality")
              .when(col("__b").isNotNull, "rejected_batch_dup")
              .when(col("__c").isNotNull, "rejected_corpus_dup")
              .when(col("__s").isNotNull, "rejected_semantic_dup")
              .otherwise("admitted").as("disposition"))
        val actions: Seq[() => Unit] = Seq(
          () => admitted.drop(vecCol).write.mode("overwrite")
            .parquet(s"${stores.corpusPath}/wave=$waveId"),
          () => DedupOps.bandIndex(admitted, idCol, textCol, n, numHashes,
              bands)
            .write.mode("overwrite")
            .parquet(s"${stores.bandIndexPath}/wave=$waveId"),
          () => ClusterStore.append(stores.clusterPath, waveEvidence),
          // a doc without an embedding is admitted but not ANN-searchable
          // (the lexical index still carries it) — never NPE the assign
          () => AnnIndexStore.append(stores.annPath,
            admitted.filter(col(vecCol).isNotNull), idCol, vecCol,
            batchId = waveId),
          () => LexIndexStore.append(stores.lexPath, admitted, idCol,
            textCol, batchId = waveId),
          () => report.write.mode("overwrite")
            .parquet(s"${stores.reportPath}/wave=$waveId"))
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          actions.size)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            actions.map(a => scala.concurrent.Future(a()))),
          scala.concurrent.duration.Duration.Inf)
        finally pool.shutdown()
        spark.read.parquet(s"${stores.reportPath}/wave=$waveId")
      } finally admitted.unpersist(blocking = false)
    } finally {
      scoped.foreach(_.unpersist(blocking = false))
      b.unpersist(blocking = false)
    }
  }
}
