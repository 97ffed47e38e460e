package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * [EXT] Deterministic dataset-construction operators: hash sampling,
 * train/val/test splitting, and sequence packing. All decisions derive
 * from the cross-engine md5 fingerprint of the row KEY — never from
 * `rand()` — so samples are reproducible run-to-run, stable under
 * re-partitioning, consistent across engines (exact SQL oracles), and a
 * re-run of an incremental pipeline assigns every row the same way
 * (the property that keeps train/test membership stable as a corpus
 * grows — rows never migrate between splits).
 *
 * Scale: sampling and split assignment are pure per-row projections
 * (zero shuffle — they run inside the scan stage). Packing shuffles once
 * on the shard key.
 */
object SamplingOps {

  import TextOps.fingerprint60

  /** Uniform bucket id in [0, k) from the row key — the shared primitive:
    * fp60 is uniform over 60 bits, so `mod k` is an unbiased bucket. */
  def hashBucket(key: Column, k: Int): Column =
    pmod(fingerprint60(key.cast("string")), lit(k.toLong))

  /** Deterministic 1/k sample: keep rows whose key hashes to residue `r`.
    * Per-row filter, zero shuffle, stable under corpus growth. */
  def hashSample(df: DataFrame, keyCol: String, k: Int, r: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), k) === r)

  /**
   * Deterministic weighted sampling WITHOUT replacement (Efraimidis–
   * Spirakis exponential races): each row draws the uniform
   * u = (fingerprint60(key) + 1) / 2⁶⁰ ∈ (0, 1] and is ranked by
   * -ln(u) / weight; the k smallest ranks are distributed exactly like a
   * sequential weighted draw without replacement. Rows with weight ≤ 0
   * are excluded (zero mass).
   *
   * Scale: scoring is a pure per-row projection of the key fingerprint
   * (reproducible, partition-invariant, stable as the corpus grows —
   * a row's rank never changes when other rows arrive); the k-smallest
   * selection compiles to TakeOrderedAndProject, which keeps k rows per
   * partition and merges heads — never a global sort of the corpus.
   */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (fingerprint60(col(keyCol).cast("string")).cast("double") +
      lit(1.0)) / lit(1152921504606846976.0) // 2^60: exact binary division
    df.filter(col(weightCol) > 0)
      .withColumn("_es_rank", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("_es_rank").asc, col(keyCol).asc)
      .limit(k)
      .drop("_es_rank")
  }

  /**
   * Deterministic split assignment over percentage weights (e.g.
   * ("train", 80), ("val", 10), ("test", 10)): the key's bucket in
   * [0, 100) picks the split. Adding documents later never moves an
   * existing document's split — membership is a pure function of the key.
   */
  def assignSplits(df: DataFrame, keyCol: String,
                   weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = hashBucket(col(keyCol), 100)
    val (expr0, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, lo), (name, w)) =>
        (when(bucket >= lo && bucket < lo + w, name).otherwise(acc), lo + w)
    }
    df.withColumn("split", expr0)
  }

  /**
   * Deterministic STRATIFIED sampling: per-stratum keep rates (e.g.
   * {"en" → 10%, "de" → 50%, rare-lang → 100%} — the standard corpus
   * rebalancing move). A row is kept iff its key's bucket in [0, 100)
   * falls below its stratum's percentage; strata without a configured
   * rate keep `defaultPct`. Same guarantees as [[hashSample]]: pure
   * per-row filter, zero shuffle, reproducible, and stable under corpus
   * growth — a document's fate never changes as other documents arrive,
   * and the SAME document keeps the same fate across strata re-weightings
   * that don't cross its bucket.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 100): DataFrame = {
    require((defaultPct +: pctByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= 100), "rates are percentages in [0, 100]")
    val bucket = hashBucket(col(keyCol), 100)
    val rate = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(strataCol) === s, p).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /**
   * Data-mixing weights: given target mixture WEIGHTS per stratum
   * (domain / language — e.g. en:2, de:1, fr:1 for a 50/25/25 blend),
   * compute per-stratum keep rates that bring the kept corpus as close as
   * possible to the target proportions WITHOUT upsampling: the binding
   * stratum (the smallest count/weight ratio — the one that runs out
   * first) is kept whole and every other stratum is downsampled pro rata.
   * Strata without a configured weight are dropped (a mixing spec is a
   * whitelist). Selection inherits every [[stratifiedSample]] guarantee:
   * per-row fingerprint filter, zero shuffle, reproducible, growth-stable.
   *
   * Determinism across engines: rates are integer percentages computed
   * with INTEGER arithmetic — `rate_s = ⌊100·w_s·n_m / (w_m·n_s)⌋` where
   * (n_m, w_m) is the binding stratum — so an exact SQL oracle reproduces
   * the same selection bit-for-bit (the driver arithmetic runs in BigInt;
   * nothing overflows at any corpus size).
   *
   * Scale: ONE aggregate pass over the corpus (the per-stratum counts —
   * ≤ #strata rows to the driver, a model artifact) + the per-row filter.
   */
  def mixProportions(df: DataFrame, keyCol: String, strataCol: String,
                     weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty, "mixProportions needs at least one stratum weight")
    require(weights.values.forall(_ > 0), "mixture weights must be positive")
    val counts = df
      .filter(col(strataCol).isin(weights.keys.toSeq.map(lit): _*))
      .groupBy(strataCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val present = weights.toSeq.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return df.filter(lit(false))
    // binding stratum: min count/weight; double division is IEEE-identical
    // across engines, lexicographic tie-break
    val (sm, wm) = present.minBy { case (s, w) => (counts(s).toDouble / w, s) }
    val rates = present.map { case (s, w) =>
      s -> ((BigInt(100) * w * counts(sm)) / (BigInt(wm) * counts(s)))
        .min(100).toInt
    }.toMap
    stratifiedSample(df, keyCol, strataCol, rates, defaultPct = 0)
  }

  /**
   * Per-stratum cap — "keep at most `maxPer` documents per domain/source"
   * (the Common-Crawl-curation guard against any one domain dominating the
   * corpus). Selection is DETERMINISTIC and growth-stable: within each
   * stratum the kept rows are the `maxPer` smallest by
   * (fingerprint60(key), key) — a uniform pseudo-random draw that any SQL
   * engine reproduces (`row_number() OVER (PARTITION BY stratum ORDER BY
   * fp, key) <= maxPer`), and adding new documents can only displace, never
   * reshuffle, the kept set.
   *
   * Scale: the obvious window rank shuffles the WHOLE corpus on the
   * stratum key; this uses the bounded-heap
   * [[graft.functions.VectorAggregators.KSmallestPairs]] aggregator
   * instead — partial aggregation prunes map-side, the shuffle carries
   * ≤ #strata × maxPer × partitions (fp, id) pairs, and the kept-id set
   * semi-joins back against the corpus (≤ #strata × maxPer rows — AQE
   * broadcasts it whenever it is small; with millions of strata it falls
   * back to a shuffled semi join, which is still O(corpus), never a sort).
   * Keys are compared as exact longs, so the selection is bit-identical
   * to the window form at any fingerprint density. `keyCol` must be
   * integral and non-null (null-key rows never match the semi join).
   */
  def capPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                    maxPer: Int): DataFrame = {
    require(maxPer > 0, "per-stratum cap must be positive")
    val ksmall = udaf(new graft.functions.VectorAggregators.KSmallestPairs(maxPer))
    val kept = df
      .filter(col(keyCol).isNotNull)
      .select(col(strataCol).as("__cap_stratum"),
        TextOps.fingerprint60(col(keyCol).cast("string")).as("__cap_fp"),
        col(keyCol).cast("long").as("__cap_id"))
      .groupBy("__cap_stratum")
      .agg(ksmall(col("__cap_fp"), col("__cap_id")).as("__cap_kept"))
      .select(explode(col("__cap_kept")).as("__cap_pair"))
      .select(col("__cap_pair._2").as("__cap_keep"))
    df.join(kept, col(keyCol).cast("long") === col("__cap_keep"), "left_semi")
  }

  /**
   * Token-budget corpus selection — "take the best documents until the
   * budget is spent": rank by quality (descending, key-tiebroken), keep
   * every document whose PRECEDING cumulative weight stays under the
   * budget. The greedy prefix-by-quality is the standard data-mixing
   * selection under a token budget; one shuffle (the global order on the
   * ranking key — at 100 TB, run per-domain first and union, or rank on
   * a coarse quality bucket + hash for a near-total order that
   * range-partitions cleanly).
   */
  def selectByBudget(df: DataFrame, keyCol: String, weightCol: String,
                     qualityCol: String, budget: Long): DataFrame = {
    // unpartitioned window: the EXACT-baseline form — corpus-sized; the shipped
    // scale path is selectByBudgetSharded (per-bucket windows, row-identical)
    val w = Window.orderBy(col(qualityCol).desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .filter(col("__cum_before") < budget)
      .drop("__cum_before")
  }

  /**
   * Scalable [[selectByBudget]] — row-identical results without the
   * full-corpus single-partition window. Three phases:
   *
   *   1. one aggregate pass: quality min/max + total weight (early-exit:
   *      everything fits);
   *   2. uniform quality bucketing (`width_bucket`, a projection) + one
   *      hash-agg of per-bucket weight sums → a DRIVER-side cumulative sum
   *      over ≤ `buckets` rows, descending quality, locating the boundary
   *      bucket b*: buckets above b* fit whole, b* fits partially with
   *      residual budget r;
   *   3. keep all rows above b* with a per-row filter (zero shuffle), and
   *      run the EXACT greedy window only over b*'s rows with budget r.
   *
   * Equivalence is structural: uniform buckets are quality-ordered, so the
   * global (quality desc, key) order is (bucket desc) then the in-bucket
   * order, and "admit while global cum-before < budget" restricted to b*
   * is exactly "admit while in-bucket cum-before < r". The window now
   * touches 1/buckets of the corpus (worst case: a quality distribution
   * collapsed into one bucket degenerates to the exact path).
   */
  def selectByBudgetSharded(df: DataFrame, keyCol: String, weightCol: String,
                            qualityCol: String, budget: Long,
                            buckets: Int = 10000): DataFrame = {
    // All driver arithmetic rides doubles, NOT a truncating long cast —
    // truncation both broke fractional-weight row-identity and could leave
    // the budget "never exceeded" (returning the whole over-budget corpus).
    // Row-identity is exact for integral weights (exact in doubles to 2^53,
    // the realistic token-count range); fractional weights agree with the
    // exact window up to fp rounding at the boundary.
    val qd = col(qualityCol).cast("double")
    val stats = df.agg(min(col(qualityCol)), max(col(qualityCol)),
      sum(col(weightCol).cast("double")),
      count(when(col(qualityCol).isNull || isnan(qd), 1))).head()
    // null/NaN qualities don't bucket (width_bucket → null key, a driver
    // NPE) — the exact path already orders them correctly; use it
    if (stats.getLong(3) > 0)
      return selectByBudget(df, keyCol, weightCol, qualityCol, budget)
    // STRICT <: at total == budget a trailing zero-weight row has
    // cum-before == budget and the exact window drops it — don't early-exit
    if (stats.isNullAt(2) || stats.getDouble(2) < budget) return df
    val (qmin, qmax) = (stats.getAs[Any](0), stats.getAs[Any](1))
    if (qmin == qmax)
      return selectByBudget(df, keyCol, weightCol, qualityCol, budget)
    val bucketed = df.withColumn("__qb",
      width_bucket(qd, lit(qmin).cast("double"), lit(qmax).cast("double"),
        lit(buckets)))
    val perBucket = bucketed.groupBy("__qb")
      .agg(coalesce(sum(col(weightCol).cast("double")), lit(0.0)).as("__w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(-_._1)
    // walk buckets from the top; STRICT < so a bucket that exactly exhausts
    // the budget becomes the boundary (its own window then reproduces the
    // exact cum-before < budget cutoff, including zero-weight rows)
    var cum = 0.0; var boundary = Long.MinValue; var residual = 0.0
    var done = false
    val it = perBucket.iterator
    while (it.hasNext && !done) {
      val (b, w) = it.next()
      if (cum + w < budget) cum += w
      else { boundary = b; residual = budget - cum; done = true }
    }
    if (!done) return df // fp safety net; unreachable when sums are exact
    // ONE pass over the kept range: buckets above the boundary pass whole,
    // the boundary bucket replays the exact greedy cutoff with the residual
    // budget. The window partitions by bucket — parallel, never the
    // full-corpus single-partition window.
    val w = Window.partitionBy("__qb")
      .orderBy(col(qualityCol).desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.filter(col("__qb") >= boundary)
      .withColumn("__cb",
        coalesce(sum(col(weightCol).cast("double")).over(w), lit(0.0)))
      .filter(col("__qb") > boundary || col("__cb") < residual)
      .drop("__qb", "__cb")
  }

  /**
   * Sequence packing: assign documents to fixed-budget packs (context
   * windows) by cumulative weight. Documents are sharded by key hash
   * (`nShards` — one shuffle, shards pack independently in parallel) and
   * packed in key order within the shard:
   * `pack_id = floor(cum_weight_before / budget)` — the deterministic
   * streaming approximation of greedy first-fit (a pack may overflow by
   * at most one document, the standard concat-then-chunk trade). At
   * 100 TB the shard count scales with the cluster; a global single-window
   * pack would serialize on one partition.
   */
  /**
   * Per-GROUP top-k rows by score through the bounded-heap aggregator —
   * the 100 TB form of `row_number() OVER (PARTITION BY g ORDER BY s
   * DESC) <= k`: the rank window shuffles EVERY row to its group's
   * partition; the heap's map-side partial aggregation prunes to k per
   * partition first, so the exchange carries |groups|·k·partitions heap
   * entries. Tie order (score desc, id asc) matches the window form
   * exactly ([[SimilarityOps.heapTopK]]'s contract), so results are
   * bit-identical to the rank filter. Ids must be integral (heap
   * entries ride as longs — fingerprint string ids first).
   */
  /**
   * Deterministic k-PER-STRATUM sample — the eval-set construction
   * primitive ("exactly 200 docs per language"): the k smallest rows of
   * each stratum in fingerprint-hash order (uniform like a random draw,
   * engine-reproducible; the fp rides mod 2⁴⁸ so its double cast is
   * exact and the heap order matches an integer sort bit-for-bit).
   * Complements [[hashSample]]/[[stratifiedSample]]: those keep a RATE
   * (membership stable as the corpus grows), this keeps a COUNT — a
   * fixed k over a growing stratum necessarily rotates members, so use
   * the rate forms for anything that must not churn.
   *
   * Returns (stratumCol, keyCol, rank) with rank 1..k per stratum.
   *
   * Scale: rides [[groupTopK]]'s bounded heap — map-side pruning to k
   * per partition, never a rank window over the corpus.
   */
  def samplePerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int): DataFrame =
    groupTopK(
        df.select(col(stratumCol), col(keyCol),
          (lit(0L) - pmod(
            graft.ext.TextOps.fingerprint60(col(keyCol).cast("string")),
            lit(1L << 48))).cast("double").as("__r")),
        stratumCol, keyCol, "__r", k)
      .select(col(stratumCol), col(keyCol), col("rank"))

  def groupTopK(df: DataFrame, groupCol: String, idCol: String,
                scoreCol: String, k: Int): DataFrame =
    SimilarityOps.heapTopK(
        df.select(col(groupCol).as("query_id"),
          col(idCol).cast("long").as("neighbor_id"),
          col(scoreCol).cast("double").as("score")), k)
      .select(col("query_id").as(groupCol), col("neighbor_id").as(idCol),
        col("score").as(scoreCol), col("rank"))

  def packByBudget(df: DataFrame, keyCol: String, weightCol: String,
                   budget: Long, nShards: Int): DataFrame = {
    val shard = hashBucket(col(keyCol), nShards)
    val w = Window.partitionBy("shard").orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("__cum_before",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__cum_before") / budget))
      .drop("__cum_before")
  }

  /**
   * Per-stratum percentile filter — "keep the top q fraction by score
   * WITHIN each stratum" (top-30% quality per language is the standard
   * curation gate: a global cutoff would empty low-resource languages).
   * Keeps rows whose `percent_rank() ≤ q` in (`scoreCol` desc, `tieCol`
   * asc) order within `stratumCol`; emits `pct_rank` (rounded to 6dp) for
   * auditability. Exact semantics: rank 0 (the best row) is always kept;
   * a single-row stratum has percent_rank 0 and survives.
   *
   * Scale: one shuffle on the stratum key + per-stratum local sort — the
   * same cost class as any per-group ranking; AQE splits skewed strata's
   * sort spills but the per-stratum order is inherently a sort. At corpus
   * scales where even that is too much, compute an approximate per-stratum
   * score threshold (approx_percentile over stratum — one agg, no sort)
   * and filter; this exact form is the auditable gate.
   */
  def percentileKeep(df: DataFrame, stratumCol: String, scoreCol: String,
                     tieCol: String, q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    val w = Window.partitionBy(stratumCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("pct_rank", round(percent_rank().over(w), 6))
      .filter(col("pct_rank") <= q)
  }

  /**
   * TEMPERATURE-SAMPLED LANGUAGE MIX (mT5 / XLM-R): multilingual training
   * corpora are sampled with `p_l ∝ (n_l / N)^α`, α < 1 flattening the
   * language distribution so low-resource languages aren't drowned by the
   * head. Emits, per stratum: the data distribution `p_data`, the
   * α-smoothed target `p_sample`, and `keep_rate` — the per-stratum
   * downsampling probability that realizes the target WITHOUT upsampling
   * (rates normalized so the most-upweighted stratum keeps everything;
   * feed it to hash-based sampling: keep fp60(id) mod M < rate·M).
   *
   * Cross-engine determinism: the α-power sum routes through a decimal
   * accumulator (addition order across partitions can't wiggle the 6dp
   * output), and all emitted values are 6dp-rounded.
   *
   * Scale: one stratum count aggregate + two 1-row broadcast artifacts
   * (the total and the normalizer) — the corpus streams once, the rest is
   * arithmetic on #strata rows.
   */
  def temperatureMixWeights(df: DataFrame, stratumCol: String,
                            alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val dec = org.apache.spark.sql.types.DecimalType(28, 14)
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__tot"))
    val p = counts.crossJoin(broadcast(tot))
      .withColumn("__p_raw", col("n_docs").cast("double") / col("__tot"))
      .withColumn("__pa", pow(col("__p_raw"), lit(alpha)))
    val z = p.agg(
      sum(col("__pa").cast(dec)).cast("double").as("__z"),
      max(col("__pa") / col("__p_raw")).as("__rmax"))
    p.crossJoin(broadcast(z))
      .select(col(stratumCol), col("n_docs"),
        round(col("__p_raw"), 6).as("p_data"),
        round(col("__pa") / col("__z"), 6).as("p_sample"),
        round((col("__pa") / col("__p_raw")) / col("__rmax"), 6).as("keep_rate"))
  }

  /**
   * CURRICULUM / PROPORTIONAL-INTERLEAVE ORDERING — the deterministic
   * "shuffled but stratified" training order: every stratum (language,
   * source, quality bucket) is spread EVENLY across the whole training
   * run rather than clumping wherever the files landed, so no epoch
   * prefix is all-English and no domain starves the tail. Each row gets
   * a pseudo-random rank `r` inside its stratum (fp60 order — stable
   * under re-partitioning and corpus growth) and the interleave key
   * `(r − 0.5) / n_stratum` ∈ (0,1); sorting by the key round-robins
   * strata proportionally to their size (the low-discrepancy lattice
   * trick: stratum quantile positions interleave like stratified
   * sampling strata).
   *
   * Returns (`idCol`, stratum, pos_in_stratum, interleave_key,
   * global_ord) — `global_ord` the 1-based total order (key asc, ties
   * stratum-then-id asc, exact double arithmetic in any engine).
   *
   * Scale: one per-stratum rank window (stratum-partitioned — parallel)
   * plus the total order, which rides the DISTRIBUTED row_number kernel
   * ([[graft.ops.StatsOps.distributedRowNumber]]: range-buckets on the
   * interleave key, per-bucket windows, broadcast prefix offsets) — no
   * single-partition stage at any corpus width. For a training-order
   * WRITE the rank column isn't even needed:
   * `repartitionByRange(interleave_key) + sortWithinPartitions`
   * realizes the same order directly.
   */
  def curriculumInterleave(df: DataFrame, idCol: String,
                           stratumCol: String): DataFrame = {
    val byStratum = Window.partitionBy(stratumCol)
      .orderBy(fingerprint60(col(idCol).cast("string")).asc, col(idCol).asc)
    val ranked = df
      .withColumn("__r", row_number().over(byStratum).cast("long"))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(stratumCol)).cast("long"))
      .withColumn("__key",
        (col("__r").cast("double") - 0.5) / col("__n"))
    // the lattice key is uniform on (0,1) BY CONSTRUCTION (stratum
    // quantile positions), so the bucket boundaries are the fixed
    // uniform grid — zero probe jobs
    graft.ops.StatsOps.distributedRowNumber(ranked, "__key",
        desc = false, tieCols = Seq(stratumCol, idCol), "global_ord",
        fixedBounds = Some((1 until 64).map(_ / 64.0).toArray))
      .select(col(idCol), col(stratumCol), col("__r").as("pos_in_stratum"),
        round(col("__key"), 6).as("interleave_key"), col("global_ord"))
  }

  /**
   * WATER-FILLING BUDGET ALLOCATION — split a fixed training-token
   * budget across strata (sources, languages) with the proportional-fair
   * cap: every stratum keeps everything it has UNLESS it exceeds the
   * water level `c`, chosen so `Σ_s min(T_s, c) = budget`. Small sources
   * survive whole; the head pays the entire cut — the max-min-fair mix
   * rule (the PaLM/LLaMA-style per-source capping dual of
   * [[temperatureMixWeights]], which fixes target PROPORTIONS instead of
   * a total). Feed `alloc_tokens` to per-stratum budget selection
   * ([[selectByBudgetSharded]] filtered per stratum) to realize it.
   *
   * Returns (`stratumCol`, n_tokens, alloc_tokens, fully_allocated) —
   * `alloc_tokens` = T_s for unsaturated strata, the 6dp water level for
   * capped ones. When the whole corpus fits the budget every stratum is
   * fully allocated (no cap exists).
   *
   * The saturation set is found with the standard sorted-prefix
   * argument: strata sorted by size ascending, stratum k is UNcapped iff
   * granting every stratum ≥ k a cap of T_k still fits the budget — a
   * monotone (prefix) condition, so two windows over |strata| rows
   * decide it. All arithmetic is integer-derived → cross-engine exact.
   *
   * Scale: one stratum-count aggregate over the corpus, then windows
   * over |strata| rows (a model-sized frame; the "sort" orders dozens of
   * strata, not documents) and two 1-row broadcast artifacts. The corpus
   * streams once and never shuffles wide.
   */
  def waterfillAllocation(df: DataFrame, stratumCol: String,
                          weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val totals = df.groupBy(stratumCol)
      .agg(sum(col(weightCol)).cast("long").as("n_tokens"))
    // unpartitioned window BOUND: |strata| rows (sources/languages)
    val w = Window.orderBy(col("n_tokens").asc, col(stratumCol).asc)
    val ranked = totals
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__p", sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(totals.agg(count(lit(1)).cast("long").as("__kk"))))
      .withColumn("__fullf",
        (col("__p") - col("n_tokens")) +
          (col("__kk") - col("__k") + 1L) * col("n_tokens") <= budget)
    val fullAgg = ranked.agg(
      sum(when(col("__fullf"), col("n_tokens")).otherwise(0L)).as("__pf"),
      sum(when(col("__fullf"), 1L).otherwise(0L)).as("__nf"))
    ranked.crossJoin(broadcast(fullAgg))
      .select(col(stratumCol), col("n_tokens"),
        when(col("__fullf"), col("n_tokens").cast("double"))
          .otherwise(round((lit(budget) - col("__pf")).cast("double") /
            (col("__kk") - col("__nf")), 6)).as("alloc_tokens"),
        col("__fullf").as("fully_allocated"))
  }

  /**
   * LENGTH-BUCKETED BATCHING audit — the padding-waste table behind
   * dynamic batching: group documents into power-of-two token-length
   * buckets (bucket b holds lengths in (2^(b−1), 2^b], the pad-to-cap
   * batching scheme) and report how many pad tokens each bucket burns.
   * `waste_ratio` ≈ 0 means the bucket packs tight; a tail bucket with
   * high waste is the signal to split it or re-pack. Lengths beyond
   * 2^maxBucket clamp into the top bucket (documented, not dropped).
   *
   * Bucket assignment is a literal integer comparison chain — no
   * float log2 (whose exactness at powers of two is engine-dependent) —
   * so the same doc lands in the same bucket in any engine.
   *
   * Returns (bucket, cap, n_docs, total_tokens, padded_tokens,
   * waste_ratio), one row per non-empty bucket.
   *
   * Scale: one narrow per-row projection + one ≤maxBucket-cardinality
   * hash aggregate. Text never moves; the shuffle carries bucket ids.
   */
  def lengthBuckets(df: DataFrame, textCol: String,
                    maxBucket: Int = 20): DataFrame = {
    require(maxBucket >= 1 && maxBucket <= 62, "maxBucket in [1, 62]")
    val n = TextOps.tokenCount(col(textCol)).cast("long")
    val bucket = (1 to maxBucket)
      .foldLeft(when(n <= 1L, lit(0))) { (acc, b) =>
        acc.when(n <= (1L << b), lit(b))
      }.otherwise(lit(maxBucket))
    df.filter(col(textCol).isNotNull)
      .select(bucket.cast("long").as("bucket"), n.as("__n"))
      .withColumn("cap", pow(lit(2.0), col("bucket")).cast("long"))
      .groupBy("bucket", "cap")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("cap"))
      .withColumn("waste_ratio",
        round((col("padded_tokens") - col("total_tokens")).cast("double") /
          col("padded_tokens"), 6))
  }

  /**
   * The 100 TB form of [[percentileKeep]]: instead of ranking every row
   * within its stratum (a per-stratum sort), compute each stratum's
   * approximate (1−q)-quantile score threshold with `approx_percentile`
   * (ONE mergeable-sketch aggregate — no sort anywhere), broadcast the
   * per-stratum thresholds back, and keep rows with `score ≥ threshold`.
   * Keep-fraction error is bounded by the sketch's rank accuracy (1/
   * `accuracy` relative rank); kept rows are always a top slice by score
   * (min kept ≥ max dropped within each stratum, by construction — the
   * sort-free filter can never interleave).
   */
  def percentileKeepApprox(df: DataFrame, stratumCol: String,
                           scoreCol: String, q: Double,
                           accuracy: Int = 10000): DataFrame = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0,1], got $q")
    val thr = df.groupBy(stratumCol)
      .agg(percentile_approx(col(scoreCol), lit(1.0 - q), lit(accuracy))
        .as("__pk_thr"))
    df.join(broadcast(thr), stratumCol)
      .filter(col(scoreCol) >= col("__pk_thr"))
      .drop("__pk_thr")
  }
}
