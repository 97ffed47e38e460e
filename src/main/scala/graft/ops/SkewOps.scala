package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation operators for hot keys. Spark's AQE handles skew for
 * sort-merge JOINs at runtime (`spark.sql.adaptive.skewJoin`), but not every
 * wide shape is covered: exact-distinct aggregation and streaming joins
 * re-plan poorly, and salt-based splitting is the portable fix at any scale.
 * Both operators return results IDENTICAL to their unsalted counterparts —
 * salting changes only the physical shuffle distribution.
 */
object SkewOps {

  /**
   * Salted equi-join for a skewed `big` side: big rows of one join key are
   * split across `buckets` shuffle partitions by a deterministic salt drawn
   * from `saltFrom` (any column; uniqueness not required), and every `small`
   * row is replicated `buckets` times so each salted sub-partition finds its
   * match. Join output is row-identical to `big.join(small, key)`.
   *
   * Cost: `small` side volume × buckets (keep `small` genuinely small);
   * `big` side unchanged. The hot key's rows now land on `buckets` reducers
   * instead of one — the same split AQE's OptimizeSkewedJoin performs, but
   * usable where AQE can't re-plan (streaming, custom operators, severe
   * single-key skew under hash agg).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: String, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(saltFrom)), lit(buckets)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Exact distinct count per group without a skew-prone single-level
   * `countDistinct`: phase 1 dedups on (group, value) — the shuffle key
   * includes the value, so a hot group spreads across the cluster — and
   * phase 2 counts per group. This is the classic two-phase exact-distinct;
   * result equals `groupBy(group).agg(countDistinct(value))` INCLUDING null
   * semantics: `count(value)` skips the (group, null) row `distinct()`
   * keeps, so nulls are never counted as a distinct value and an all-null
   * group reports 0 — while the group itself survives (countDistinct keeps
   * every group too).
   */
  def distinctCountTwoPhase(df: DataFrame, groupCol: String,
                            valueCol: String): DataFrame =
    df.select(col(groupCol), col(valueCol))
      .distinct()
      .groupBy(groupCol)
      .agg(count(col(valueCol)).as(s"n_distinct_$valueCol"))

  /**
   * Bloom-pruned equi-join — an explicit runtime filter for a
   * fact ⋈ selective-dim join: a bloom filter over the dim side's join
   * keys (a model-sized sketch: ~1.2 MB per million keys at 1% fpp) is
   * folded into the fact scan as a codegen'd `might_contain` predicate, so
   * fact rows whose key cannot match are dropped AT THE SCAN, before the
   * join shuffle ever moves them. With a 5%-selective dim, ~95% of a
   * 100 TB fact table never leaves the mapper. The result is row-identical
   * to `big.join(small, bigKey === smallKey)`: bloom false positives are
   * eliminated by the exact join that follows; keys are pre-hashed with
   * `xxhash64` on BOTH build and probe sides, so any key type joins
   * consistently.
   *
   * This is exactly what Spark's AQE runtime bloom filter
   * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects when its
   * cost heuristics fire; the explicit operator guarantees the filter in
   * the plan — streaming foreachBatch joins, custom operators, or
   * threshold edge cases where the optimizer declines.
   *
   * Cost: one pass over the dim side to size + build the sketch (the dim
   * side is the SELECTIVE side — that pass is cheap by assumption), driver
   * memory for the sketch only.
   */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame,
                      bigKey: String, smallKey: String,
                      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val hashed = small.select(xxhash64(col(smallKey)).as("__bf_h"))
    val expected = math.max(hashed.count(), 1L)
    val bf = hashed.stat.bloomFilter("__bf_h", expected, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    val might = graft.functions.ColumnBridge.column(
      BloomFilterMightContain(Literal(bytes.toByteArray),
        graft.functions.ColumnBridge.expression(xxhash64(col(bigKey)))))
    big.filter(might).join(small, col(bigKey) === col(smallKey))
  }

  /**
   * SKEW diagnosis report for a prospective shuffle key — the numbers
   * an operator reads BEFORE choosing between a plain join, AQE skew
   * handling, or [[saltedJoin]]: key cardinality, rows, mean/median/p99/
   * max per-key counts, the skew ratio max/mean (a hot key's reducer
   * runs that many times longer than the average), and the heaviest key
   * itself. One row out; NULL keys excluded (they never co-locate in an
   * equi-join anyway).
   *
   * Deterministic: counts exact; percentiles interpolate over exact
   * integers; ratios round 4dp; the top key ties to the smallest key
   * string.
   *
   * Scale: one (key, count) aggregate — the same partial-aggregating
   * shuffle the diagnosed join would pay, minus its build side — then a
   * key-cardinality-sized rollup. Run it on a sample for quick looks;
   * exact is affordable because counts compress map-side.
   */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
    val top = counts
      .orderBy(col("__c").desc, col("__k").asc)
      .limit(1).select(col("__k").as("__top"))
    counts.agg(
        count(lit(1)).as("n_keys"), sum(col("__c")).as("n_rows"),
        expr("percentile(__c, 0.5)").as("__med"),
        expr("percentile(__c, 0.99)").as("__p99"),
        max(col("__c")).as("max_count"))
      .crossJoin(broadcast(top))
      .select(col("n_keys"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_keys").cast("double"), 4)
          .as("mean_count"),
        round(col("__med"), 4).as("median_count"),
        round(col("__p99"), 4).as("p99_count"),
        col("max_count"),
        round(col("max_count").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")), 4)
          .as("skew_ratio"),
        col("__top").as("top_key"))
  }
}
