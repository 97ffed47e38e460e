package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable QUANTILE sketches — the percentile analog of the HLL
 * distinct-count rollup (SparkEntry `q_sketch_rollup`): build a bounded
 * per-(group, partition-key) sketch once, persist it, and answer
 * coarser-grain quantile questions by MERGING sketches instead of
 * re-scanning the corpus. At 100 TB, "p99 latency per day, and overall"
 * must not cost two full scans; with persisted daily sketches the overall
 * quantile is a |days|-row merge.
 *
 * The sketch is a bottom-k-by-hash value sample: keep the k (hash, value)
 * pairs with the smallest `xxhash64(key)` over a UNIQUE row key, plus the
 * exact row count n. Rank error is O(1/sqrt(k)) like any sampling sketch,
 * but unlike KLL/t-digest the state is a pure function of the input set —
 * merge (union, keep k smallest) is exactly commutative, associative, and
 * partition-order-free, so estimates are BIT-DETERMINISTIC across runs,
 * partitionings, and merge trees. That determinism is what lets a
 * cross-engine oracle stipulate the sketch's error bound as a stable
 * boolean, and what makes persisted sketches safely re-mergeable in any
 * order by downstream consumers.
 *
 * Scale shape: `reduce` prunes map-side (full partial aggregation), so a
 * sketch build shuffles ≤ k·partitions pairs per group — never the corpus;
 * a merge touches only k-sized arrays. The inputs of a merge must be
 * sketches over DISJOINT row sets (n is summed); re-merging overlapping
 * sketches double-counts, same contract as any additive sketch.
 */
object SketchOps {

  /** Sketch column names appended by [[sketch]] / [[mergeSketches]]. */
  val NCol = "sk_n"
  val PairsCol = "sk_pairs"

  /**
   * Build one sketch per `groupCols` group: exact count `sk_n` plus the
   * bottom-k sample `sk_pairs` (array of (hash, value) structs, hash asc).
   * `keyCol` must uniquely key rows (an id column) — the hash order over
   * keys IS the sampling design; `valueCol` is cast to double. Null values
   * are dropped (they have no quantile rank).
   */
  def sketch(df: DataFrame, keyCol: String, valueCol: String,
             groupCols: Seq[String], k: Int = 1024): DataFrame = {
    require(k > 0, s"bad sketch size k=$k")
    val bk = udaf(new graft.functions.VectorAggregators.BottomKSample(k))
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(NCol),
        bk(xxhash64(col(keyCol)), col(valueCol).cast("double")).as(PairsCol))
  }

  /**
   * Merge sketches over disjoint row sets to a coarser grouping: sum the
   * exact counts, re-select the k smallest hashes from the union of the
   * samples. Exploding ≤ k-sized arrays is the whole input — corpus data
   * never participates.
   */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
                    k: Int = 1024): DataFrame = {
    val bk = udaf(new graft.functions.VectorAggregators.BottomKSample(k))
    val g = groupCols.map(col)
    // two aggregates over the |input sketches|-row frame (k-sized arrays,
    // never corpus data): counts can't ride the exploded frame (each pair
    // row would repeat its sketch's n), so they aggregate unexploded
    val merged = df
      .select(g :+ explode(col(PairsCol)).as("__p"): _*)
      .groupBy(g: _*)
      .agg(bk(col("__p._1"), col("__p._2")).as(PairsCol))
    df.groupBy(g: _*).agg(sum(col(NCol)).as(NCol))
      .join(merged, groupCols)
      .select(groupCols.map(col) :+ col(NCol) :+ col(PairsCol): _*)
  }

  /**
   * Estimated quantile `p` from a sketch's sample column: the value at
   * rank ceil(p·|sample|) of the value-sorted sample (rank 1 at p=0).
   * Pure native functions — stays inside codegen.
   */
  def sketchQuantile(pairs: Column, p: Double): Column = {
    require(p >= 0 && p <= 1, s"bad quantile p=$p")
    val vals = array_sort(transform(pairs, x => x.getField("_2")))
    element_at(vals,
      greatest(lit(1), ceil(lit(p) * size(pairs)).cast("int")))
  }

  /**
   * Audit a sketch estimate against the TRUE distribution: the exact CDF
   * position of each estimated quantile, checked against the sampling
   * bound |rank(est)/n − p| ≤ eps. One narrow aggregate per (group, p)
   * over the corpus — this is the VERIFICATION pass a production pipeline
   * runs on a fixture slice, not per query.
   *
   * `estimates`: (groupCols…, p, est). Returns (groupCols…, p, est_rank
   * = exact CDF position rounded 6dp, within_eps boolean).
   */
  /** Set-sketch column name appended by [[setSketch]] / [[mergeSetSketches]]. */
  val KmvCol = "kmv_hashes"

  /**
   * KMV SET sketch per group: the k smallest distinct `xxhash64(key)`
   * values ([[graft.functions.VectorAggregators.KmvSetSketch]]) — a
   * bounded stand-in for the group's distinct KEY SET that answers
   * distinct-count, union, intersection, and Jaccard questions
   * ([[kmvDistinct]], [[kmvJaccard]]) without ever shuffling the keys
   * themselves. The audience-overlap / cross-slice-dedup primitive:
   * "how many customers do these two years share" at 100 TB is two
   * persisted k-long arrays and a per-row array intersect.
   *
   * Unlike [[sketch]] (disjoint-input additive n), the state is a pure
   * function of the distinct key set, so sketches of OVERLAPPING slices
   * merge exactly: merge = bottom-k of the set union. Duplicates
   * collapse inside the aggregator — no pre-distinct shuffle.
   *
   * Scale: full partial aggregation, ≤ k·partitions hashes shuffle per
   * group; estimation error is O(1/√k).
   */
  def setSketch(df: DataFrame, keyCol: String, groupCols: Seq[String],
                k: Int = 256): DataFrame = {
    require(k > 1, s"bad sketch size k=$k")
    val kmv = udaf(new graft.functions.VectorAggregators.KmvSetSketch(k))
    df.filter(col(keyCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(xxhash64(col(keyCol))).as(KmvCol))
  }

  /**
   * Merge set sketches to a coarser grouping — valid for OVERLAPPING
   * member sets (a customer active in every month counts once in the
   * year), and bit-identical to a direct [[setSketch]] at the coarse
   * grain: both are the bottom-k of the same distinct hash set.
   */
  def mergeSetSketches(df: DataFrame, groupCols: Seq[String],
                       k: Int = 256): DataFrame = {
    val kmv = udaf(new graft.functions.VectorAggregators.KmvSetSketch(k))
    df.select(groupCols.map(col) :+ explode(col(KmvCol)).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("__h")).as(KmvCol))
  }

  /**
   * Distinct-count estimate from a set sketch: exact size while the
   * sketch is unsaturated (< k hashes — it holds the whole set), else
   * the classic KMV estimator (k−1)/u_k with u_k = the k-th smallest
   * hash normalized to (0, 1]. Native column arithmetic; deterministic
   * for a given key set.
   */
  def kmvDistinct(hashes: Column, k: Int): Column = {
    val uk = (element_at(hashes, k).cast("double") -
      lit(Long.MinValue.toDouble)) / lit(math.pow(2.0, 64))
    when(size(hashes) < k, size(hashes).cast("double"))
      .otherwise(lit((k - 1).toDouble) / uk)
  }

  /**
   * Jaccard estimate between two set sketches: the fraction of the
   * merged bottom-k present in BOTH input sketches (the standard KMV
   * coincidence estimator; std error ≈ √(J(1−J)/k)). Intersection
   * size ≈ this × [[kmvDistinct]] of the merged sketch.
   */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    when(size(merged) === 0, lit(0.0))
      .otherwise(size(array_intersect(array_intersect(merged, a), b))
        .cast("double") / size(merged))
  }

  def rankErrorAudit(df: DataFrame, valueCol: String, groupCols: Seq[String],
                     estimates: DataFrame, eps: Double): DataFrame = {
    val est = broadcast(estimates)
    df.filter(col(valueCol).isNotNull)
      .join(est, groupCols)
      .groupBy((groupCols.map(col) :+ col("p") :+ col("est")): _*)
      .agg((sum(when(col(valueCol) <= col("est"), 1L).otherwise(0L)) /
        count(lit(1))).as("__frac"))
      .select(groupCols.map(col) :+ col("p") :+
        round(col("__frac"), 6).as("est_rank") :+
        (abs(col("__frac") - col("p")) <= eps).as("within_eps"): _*)
  }
}
