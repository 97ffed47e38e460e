package graft

/**
 * CI plan gate over EVERY `SparkEntry.queries` entry: compiles each query's
 * physical plan at sf0.001 and asserts the anti-patterns that sink a 100 TB
 * run can never silently return:
 *
 *  - `CartesianProduct` — O(|L|·|R|) with both sides shuffled; never
 *    acceptable in any query here.
 *  - `BroadcastNestedLoopJoin` — acceptable ONLY when the broadcast side is
 *    a bounded scalar / model artifact (a 1-row aggregate, a k-row centroid
 *    or query set). Those queries are whitelisted BY NAME below; everything
 *    else must plan an equi-join.
 *  - `Window` in the ANN top-k family — the bounded-heap aggregate is the
 *    contract (the exchange carries ≤k-element buffers, not |Q|·|C| ranked
 *    pairs); a Window node means the heap regressed to a rank window.
 *
 * The assertions run on the statically-planned `executedPlan` (no
 * execution): AQE runtime replanning can turn a shuffle join into a
 * broadcast join, but never introduces a nested-loop or cartesian node that
 * the static planner didn't choose, so the static plan is the right (and
 * cheap) place to pin these.
 */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * every entry's broadcast side is a bounded artifact (1-row corpus
    * aggregate, ≤k centroids, the broadcast query set of a top-k), so the
    * "nested loop" is a constant-width scalar join, the correct 100 TB
    * plan. Reviewed per name — add here only with the same justification. */
  private val bnljAllowed: Set[String] = Set(
    "q22_dormant_customers", // 1-row scalar subquery (avg acctbal) broadcast
    "q_benford",             // 1-row total-count broadcast
    "q_bm25_topk",           // 1-row corpus stats (N, avgdl) broadcasts
    "q_cosine_topk",         // broadcast query set — the documented top-k shape
    "q_count_reconcile",     // two 1-row counts joined
    "q_cross_join",          // the operator IS cross join (3 tiny dims, 125 rows)
    "q_drift_psi",           // 1-row per-side totals broadcast
    "q_embedding_dist_hist", // bounded sampled-pair broadcast side
    "q_hybrid_rrf",          // fuses q_bm25_topk + q_cosine_topk: inherits
                             // their 1-row-stats and query-set broadcasts
    "q_importance_weights",  // 1-row target/corpus token totals (DSIR)
    "q_category_pmi",        // 1-row corpus-count broadcast
    "q_decayed_activity",    // 1-row reference-timestamp broadcast
    "q_join_preflight",      // three 1-row count aggregates joined
    "q_centroid_matrix",     // |labels|-row centroid artifact theta-joined
                             // against itself (label1 < label2) — bounded
    "q_hill_tail",           // 1-row reference order statistic broadcast
    "q_margin_mining",       // cosineTopK's broadcast query set
    "q_split_parity",        // 1-row corpus-count broadcast
    "q_modularity",          // 1-row total-edge-count broadcast
    "q_shard_conductance",   // 1-row total-edge-count broadcast
    "q_ivf_topk_probe2",     // ≤c-row centroid broadcast on both sides
    "q_ivfpq_topk",          // exact-baseline cosineTopK's broadcast query set
    "q_pmi_collocations",    // 1-row corpus token total broadcast
    "q_bm25_batch",          // 1-row corpus-stats broadcast
    "q_lm_dirichlet",        // 1-row corpus-token-total broadcast (the
                             // q_bm25_batch stats shape)
    "q_bootstrap_ci",        // 1-row replicate-count + 1-row lo/hi-means
                             // broadcasts over the R-row replicate table
    "q_bm25_index_topk",     // same 1-row stats broadcast, index-backed
    "q_hybrid_store_rrf",    // inherits the index-backed BM25 stats join
    "q_ann_store_pq",        // exact-baseline cosineTopK's broadcast query set
    "q_self_retrieval_mrr",  // 1-row corpus-stats + 1-row query-count broadcasts
    "q_kneser_ney",          // 1-row bigram-type-count broadcast
    "q_nb_classify",         // K-row prior/total + 1-row vocab-size broadcasts
    "q_nb_confusion",        // same model artifacts as q_nb_classify
    "q_nb_threshold_sweep",  // + tiny threshold-grid and 1-row total broadcasts
    "q_temperature_mix",     // 1-row total + 1-row normalizer broadcasts
    "q_waterfill_mix",       // 1-row stratum-count + 1-row saturation broadcasts
    "q_pq_rerank",           // codebook-pool + query-set broadcasts (4 stages)
    "q_ann_recall_audit",    // per-grid-point 1-row n_hit × n_true joins
    "q_ann_recall_audit_pq", // same, over the IVF+PQ grid
    "q_tfidf_topterms",      // 1-row doc-count broadcast
    "q_unigram_logprob",     // 1-row corpus token total broadcast
    "q_embedding_drift",     // driftPsi's 1-row smoothing-totals broadcast
    "q_knn_classify",        // cosineTopK's broadcast query set
    "q_linkage_scores",      // 1-row u-weight artifact built from per-field
                             // scalar aggs (2 builds + 1 scoring join)
    "q_cluster_agreement",   // three 1-row C(n,2)-sum artifacts joined
    "q_knn_confusion",       // cosineTopK's broadcast query set
    "q_chi_square",          // 1-row total + 1-row dof broadcasts
    "q_ks_test",             // 1-row group-total broadcast
    "q_rfm",                 // 1-row corpus-max-date broadcast
    "q_basket_lift",         // 1-row basket-total broadcast
    "q_vocab_overlap",       // |sources|-row sketch table theta-joined
                             // against itself (src_a < src_b) — bounded
    "q_mutual_info",         // 1-row corpus-total broadcast (chi² shape)
    "q_g_test",              // chi²'s 1-row total + dof broadcasts
    "q_ipf_rake",            // 1-row n/ka/kb broadcast over the bounded
                             // cell grid (round joins are equi/hashed)
    "q_seasonal_decompose",  // 1-row day-bounds broadcast over the day
                             // grid (the acf shape)
    "q_granger_lite",        // 1-row day-bounds broadcast; lag join is
                             // the day-grid equi self-join
    "q_cramers_v",           // chi²'s 1-row total + dof broadcasts
    "q_cohen_kappa",         // two 1-row artifacts (diag, Σ ra·rb) joined
    "q_tcloseness",          // 1-row support-size/total broadcast over the
                             // bounded cells×support grid
    "q_cusum",               // 1-row grand-total broadcast over the
                             // day-count-sized series
    "q_ewma_baseline",       // day-count-sized triangular self-join (i ≤ j)
                             // — quadratic in DAYS, not data; bounded
    "q_theil_sen",           // same day×day triangular join (i < j) + 1-row
                             // min-day and day-count broadcasts
    "q_mann_kendall",        // theil_sen's day×day triangle + a 1-row
                             // tie-mass broadcast
    "q_durbin_watson",       // 1-row day-bounds + fitted-coefficient
                             // broadcasts over the day grid
    "q_cuped",               // 1-row time-midpoint + 1-row pooled-moment
                             // broadcasts (the experiment-readout shape)
    "q_chi_residuals",       // chi²'s marginal grid (ra×rb, |levels|²-
                             // bounded) + 1-row total broadcast
    "q_skew_report",         // 1-row summary × 1-row top-key broadcast
    "q_kaplan_meier",        // 1-row corpus-max-day + 1-row at-risk-total
                             // broadcasts over the duration histogram
    "q_lorenz",              // 1-row totals + 10-row decile grid broadcast
                             // over the value histogram
    "q_median_survival",     // the q_kaplan_meier shape (1-row max-day +
                             // at-risk-total broadcasts), crossed at 0.5
    "q_jsd_langs",           // 1-row token/vocab-totals broadcast over
                             // the vocabulary-sized count table
    "q_qq_points",           // two 1-row decile-array artifacts zipped
    "q_standardized_effect", // 1-row stratum-total broadcast over the
                             // |strata|-row cell table
    "q_degree_assortativity", // two 1-row artifacts (moments × node
                             // count) joined
    "q_mmr_rerank",          // cosineTopK's broadcast query set; greedy
                             // rounds run on checkpointed pool-sized frames
    "q_mmr_store",           // same shape off the persisted index
    "q_did_readout",         // q_cuped's 1-row time-midpoint broadcast
    "q_qte_deciles",         // two 1-row decile-array artifacts zipped
    "q_conformal_interval",  // 1-row n_cal and q-hat artifacts over the
                             // residual histogram
    "q_skipgram_pmi",        // 1-row token-total + pair-total broadcasts
                             // (the q_pmi_collocations shape)
    "q_ndcg_self",           // q_self_retrieval_mrr's 1-row artifacts
    "q_mcnemar",             // q_cuped's 1-row time-midpoint broadcast
    "q_parity_audit",        // 1-row best-rate broadcast over the
                             // |langs|-row rate table
    "q_seasonality_strength", // 1-row grand-total broadcast over the
                             // 7-row day-of-week cells
    "q_entropy_rate",        // 1-row transition-total broadcast over the
                             // states²-bounded cell table
    "q_isotonic_calibration", // the bins²-bounded minimax grid is a
                             // broadcast theta-join by construction
    "q_recalibration_gain",  // same grid, scored to the two ECEs
    "q_gains_curve",         // 1-row population/positive-totals broadcast
                             // over the 10-bin histogram
    "q_pr_curve",            // same 10-bin histogram shape
    "q_hazard_curve",        // q_kaplan_meier's 1-row broadcasts
    "q_neyman_allocation",   // 1-row weight-total broadcast over the
                             // |strata|-row cells
    "q_median_ci",           // 1-row rank-thresholds broadcast over the
                             // value histogram
    "q_acf",                 // 1-row day-bounds + series-totals broadcasts
                             // over the day-count-sized grid
    "q_xcf",                 // same shape, bivariate
    "q_anova_f",             // 1-row grand-total broadcast over the k-row
                             // group moments (anovaCore)
    "q_levene",              // anovaCore's 1-row total broadcast (the
                             // group-means join itself is equi/hashed)
    "q_tukey_pairs",         // k-row group aggregate theta-joined against
                             // itself (g_a < g_b) + 1-row MS_W broadcast
    "q_kruskal_wallis",      // 1-row n/ties-total broadcast over the
                             // k-row group rank sums
    "q_changepoint_mean",    // 1-row grand-total broadcast over the
                             // day-count-sized series (the cusum shape)
    "q_pettitt",             // 1-row day-count broadcast over the day grid
    "q_log_rank",            // 1-row max-day + arm-total broadcasts over
                             // the duration grid (the kaplan-meier shape)
    "q_wasserstein",         // 1-row group-total broadcast over the
                             // pre-binned value support (the KS shape)
    "q_cvm_test",            // same KS-shape 1-row total broadcast
    "q_brunner_munzel",      // 1-row rank-total broadcast over the
                             // support histogram (the KS shape)
    "q_nelson_aalen",        // kaplan-meier's 1-row max-day + risk-total
                             // broadcasts over the duration grid
    "q_kendall_tau",         // |X|x|Y| marginal cross (the cramers_v
                             // dense-grid shape) + 1-row tie broadcasts
    "q_friedman",            // day-grid x |types| dense cross + 1-row
                             // k/tie-mass broadcasts
    "q_page_trend")          // friedman's 1-row k broadcast + k-row
                             // weight artifact

  /** ANN/top-k paths that must stay on the bounded-heap aggregate. */
  private val annHeapOnly: Set[String] = Set(
    "q_cosine_topk", "q_ann_topk", "q_ivf_topk", "q_ivf_topk_probe2",
    "q_pq_rerank", "q_ivfpq_topk", "q_minhash_topk", "q_group_topk",
    "q_cell_prototypes", "q_stratified_topk", "q_contrastive_pairs",
    "q_item_cf_topk")

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("no CartesianProduct anywhere; BroadcastNestedLoopJoin only where whitelisted") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val violations = names.flatMap { name =>
      val plan = planOf(name)
      val cart = "CartesianProduct".r.findAllIn(plan).length
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      val bad = Seq(
        (cart > 0) -> s"$name: CartesianProduct x$cart",
        (bnlj > 0 && !bnljAllowed(name)) -> s"$name: BroadcastNestedLoopJoin x$bnlj (not whitelisted)")
      bad.collect { case (true, msg) => msg }
    }
    withClue(violations.mkString("plan violations:\n", "\n", "\n")) {
      violations shouldBe empty
    }
  }

  test("ANN top-k family plans the bounded heap, never a rank Window") {
    val violations = annHeapOnly.toSeq.sorted.flatMap { name =>
      val plan = planOf(name)
      val win = "Window".r.findAllIn(plan).length
      if (win > 0) Some(s"$name: Window x$win in ANN plan") else None
    }
    withClue(violations.mkString("ANN window violations:\n", "\n", "\n")) {
      violations shouldBe empty
    }
    // and the heap aggregate is actually present
    annHeapOnly.toSeq.sorted.foreach { name =>
      withClue(s"$name missing ObjectHashAggregate (heap) node: ") {
        planOf(name) should include("ObjectHashAggregate")
      }
    }
  }

  test("nested-document source: predicate pushdown + nested schema pruning reach the scan") {
    // The reference pushes find(query, projection) INTO Mongo (DAG:94-132)
    // so the server never ships unselected fields or unmatched documents.
    // The engine-side contract on a nested columnar source is the same,
    // enforced by Catalyst: a filter on a nested leaf lands in the scan's
    // PushedFilters, and the ReadSchema carries ONLY the selected leaves —
    // unread struct fields (profile.first_ts here) never leave the file.
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft_nested_").toString
    Seq((1L, 3L, "2024-01-01", Seq((10L, "a", 1.0), (11L, "b", 2.0))),
        (2L, 1L, "2024-02-02", Seq((20L, "c", 3.0))))
      .toDF("user_id", "n", "f", "ev")
      .select(col("user_id"),
        struct(col("n").as("n_events"), col("f").as("first_ts")).as("profile"),
        transform(col("ev"), e => struct(e.getField("_1").as("event_id"),
          e.getField("_2").as("event_type"), e.getField("_3").as("value")))
          .as("events"))
      .write.parquet(s"$work/docs")

    val q = spark.read.parquet(s"$work/docs")
      .filter(col("profile.n_events") >= 2)
      .select(col("user_id"), col("profile.n_events").as("n_events"),
        explode(col("events.event_id")).as("event_id"))
    val plan = q.queryExecution.executedPlan.toString

    // nested PREDICATE pushdown: the profile.n_events filter reaches the
    // parquet scan (server-side find(query) analog)
    plan should include("PushedFilters")
    plan should include regex "PushedFilters: \\[[^\\]]*profile\\.n_events"
    // nested SCHEMA pruning: only the read leaves survive in ReadSchema
    // (projection analog) — the unread profile.first_ts and the unread
    // array-element leaves must be pruned out of the scan
    val readSchema =
      "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    readSchema should include("n_events")
    // (`not` is shadowed by functions._ here — assert via boolean)
    readSchema.contains("first_ts") shouldBe false
    readSchema.contains("event_type") shouldBe false

    // and the result itself is right (filter kept user 1 only)
    q.orderBy("event_id").as[(Long, Long, Long)].collect() shouldBe
      Array((1L, 3L, 10L), (1L, 3L, 11L))
  }

  test("PQ/IVF queries ride the native kernels, not the declarative argmax") {
    // the struct-per-centroid/code forms cross Janino's 64 KB method
    // limit at production sizes and silently drop to interpreted eval —
    // these plans must carry the reference-object expressions
    Seq("q_pq_quantize", "q_pq_rerank", "q_ivfpq_topk").foreach { name =>
      withClue(s"$name missing graft_pq_encode: ") {
        planOf(name) should include("graft_pq_encode")
      }
    }
    Seq("q_ivf_topk", "q_ivf_topk_probe2", "q_ivfpq_topk").foreach { name =>
      withClue(s"$name missing graft_centroid_cells: ") {
        planOf(name) should include("graft_centroid_cells")
      }
    }
  }

  test("set-similarity verification rides the early-exit overlap kernel") {
    // the verify step of the two most expensive pair joins must carry
    // graft_overlap_ge (sorted-merge, remaining-length short-circuit) —
    // a silent regression to array_intersect walks both full arrays per
    // candidate and re-opens the round-11 top bench lines
    Seq("q_containment_pairs", "q_jaccard_prefix").foreach { name =>
      withClue(s"$name missing graft_overlap_ge: ") {
        planOf(name) should include("graft_overlap_ge")
      }
    }
  }

  /** Queries whose plan legitimately carries an UNPARTITIONED Window:
    * every entry's window input is bounded by construction — a grid
    * whose cardinality does NOT grow with corpus size (days, bins,
    * cents/value range, top-k limits, replicate counts, or the ≤256-row
    * bucket grid of the distributed rank kernel). This is the
    * q_spearman gate (round 12's one `weak`): an unpartitioned window
    * over a corpus-scaled input is a single-task sort at 100 TB, so any
    * query NOT named here must plan zero unpartitioned windows — and a
    * name listed here that stops planning one must be removed (the
    * stale-entry assertion below), so the list can't rot into a bypass.
    * Add entries only with the same input-bound justification. */
  private val unpartWindowAllowed: Set[String] = Set(
    "q_bootstrap_ci",       // ≤R(=40) replicate-mean rows ranked for the CI
    "q_conformal_interval", // 8dp-rounded residual histogram — value-range-
                            // bounded, the KS pre-bin convention
    "q_curriculum_interleave", // distributed-rank kernel bucket grid (≤256
                            // bucket totals; the support windows are
                            // __bkt-partitioned)
    "q_brunner_munzel",     // kernel bucket grid ×3 rank maps
    "q_changepoint_mean",   // day-grid series (the cusum shape)
    "q_cliffs_delta",       // distributed-rank kernel bucket grid
    "q_cusum",              // day-grid series (one exact-cents row per day)
    "q_cvm_test",           // dollar-binned support (the KS shape)
    "q_durbin_watson",      // day-grid residual lag window
    "q_kruskal_wallis",     // distributed-rank kernel bucket grid (≤256
                            // bucket totals; support windows __bkt-split)
    "q_drawdown",           // day-grid close series
    "q_ewma_baseline",      // day-grid series (3 windows, all day-bounded)
    "q_gains_curve",        // 10 score-decile bins
    "q_hazard_curve",       // duration-day grid (Kaplan-Meier shape)
    "q_hill_tail",          // top-101 order statistics (limit before rank)
    "q_hybrid_rrf",         // k(=20)-row BM25 top-k artifact re-ranked
    "q_isotonic_calibration", // ≤50 calibration bins
    "q_kaplan_meier",       // duration-day grid
    "q_ks_test",            // dollar-binned support — value-range-bounded
    "q_log_rank",           // duration-day grid (the kaplan-meier shape)
    "q_nelson_aalen",       // duration-day grid (the kaplan-meier shape)
    "q_page_trend",         // k-row treatment-weight artifact ranked
    "q_pettitt",            // day-grid rank + time windows
    "q_qini",               // ≤10 decile rows cumulated (deciles ride
                            // the NTILE kernel's partitioned windows)
    "q_seasonal_decompose", // day-grid 7-day centered window
    "q_wasserstein",        // dollar-binned support (the KS shape)
    "q_lorenz",             // cents histogram — value-range-bounded
    "q_mann_whitney",       // distributed-rank kernel bucket grid
    "q_mase",               // day-grid series
    "q_median_ci",          // cents histogram of order totals
    "q_median_survival",    // duration-day grid
    "q_peak_concurrency",   // distributed-cumsum kernel bucket grid (the
                            // boundary-second support itself is
                            // __bkt-partitioned)
    "q_pr_curve",           // 10 score-decile bins
    "q_rank_overlap",       // two top-30 ranked lists
    "q_recalibration_gain", // calibration-bin grid
    "q_roc_auc",            // distributed-rank kernel bucket grid
    "q_skyline",            // pass-2 frontier: per-partition Pareto
                            // survivors only (the constant partition key
                            // folds away in the physical plan)
    "q_spearman",           // kernel bucket grid, one per rank map
    "q_sprt_monitor",       // day-grid decision series
    "q_vocab_growth",       // crawl-batch grid (one row per ingest wave —
                            // schedule-bounded, not data-proportional)
    "q_volatility",         // day-grid close series
    "q_waterfill_mix",      // |strata|-row allocation grid
    "q_zipf_slope")         // top-200 vocabulary ranks (limit before rank)

  private def unpartWindows(name: String) =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }

  test("unpartitioned windows only over whitelisted bounded grids — and the whitelist stays live") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val violations = names.flatMap { name =>
      val n = unpartWindows(name).length
      if (n > 0 && !unpartWindowAllowed(name))
        Some(s"$name: $n unpartitioned Window(s) — single-task sort at " +
          "scale; partition it, route it through the distributed rank " +
          "kernel (StatsOps.distributedCumSum), or justify the bound here")
      else if (n == 0 && unpartWindowAllowed(name))
        Some(s"$name: whitelisted but plans no unpartitioned window — " +
          "remove the stale entry")
      else None
    }
    withClue(violations.mkString("unpartitioned-window violations:\n", "\n", "\n")) {
      violations shouldBe empty
    }
  }
}
