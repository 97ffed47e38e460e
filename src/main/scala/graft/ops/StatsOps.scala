package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution-shaping operators: per-group winsorization (outlier
 * clipping) and the 2-D skyline (Pareto frontier). Extends the reference's
 * QC surface (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:333-369`
 * checks ranges but only reports; winsorize is the repair action) toward
 * the feature-engineering ops a training-data pipeline needs.
 */
object StatsOps {

  /**
   * Money/metric quantization to exact integer cents — THE determinism
   * contract the money-summing oracles rely on, shared so the guard
   * lives once. NaN and |v| > 1e15 return NULL instead of throwing:
   * Spark 4 runs ANSI mode by default, where the bare DECIMAL(18,2)
   * cast of a NaN or out-of-range double kills the whole job — one bad
   * gauge reading must cost one row, not the query. Callers filter the
   * null (dirty-row-skip semantics).
   */
  private[graft] def cents(c: Column): Column =
    when(!isnan(c) && c.between(-1e15, 1e15),
      (c.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long"))
      .otherwise(lit(null))

  /**
   * Winsorize `valueCol` per `group`: clip to the exact [`lo`, `hi`]
   * quantiles of the group's own distribution (bounds rounded to 6 dp so
   * the clipped value is reproducible across engines). Appends
   * `<valueCol>_w`; all input columns pass through.
   *
   * One aggregate over the groups (bounds are |groups| rows) + a broadcast
   * join back — the corpus itself is never sorted or shuffled. Exact
   * percentiles pay one full-width agg per group; for corpora where even
   * that is too wide, the `percentile_approx` sketch drops in unchanged
   * (see SamplingOps.percentileKeepApprox for the precedent).
   */
  def winsorize(df: DataFrame, group: String, valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad quantile range [$lo,$hi]")
    val bounds = df.groupBy(group).agg(
      round(expr(s"percentile($valueCol, $lo)"), 6).as("_lo"),
      round(expr(s"percentile($valueCol, $hi)"), 6).as("_hi"))
    df.join(broadcast(bounds), Seq(group))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /**
   * 2-D skyline (Pareto frontier): keep rows not strictly dominated —
   * no other row has `xCol` ≤ (smaller-is-better) AND `yCol` ≥
   * (bigger-is-better) with at least one strict. Equal (x, y) pairs
   * dominate neither direction, so exact duplicates all survive.
   *
   * `xCol` must be integral (the strict-predecessor window uses a RANGE
   * frame, which Spark restricts to integral order keys — convert prices
   * to cents etc. at the call site).
   *
   * Implementation is the classic two-phase distributed skyline: a LOCAL
   * skyline per input partition (window keyed by the scan partition id —
   * every globally non-dominated row is locally non-dominated, so pruning
   * is lossless), then the GLOBAL pass over local survivors only. The sort
   * each phase pays is the sort-based skyline algorithm itself; phase 2's
   * single partition sees only frontier candidates (typically O(√n) of a
   * random corpus), never the corpus. A row survives a pass iff its y
   * strictly exceeds every strictly-cheaper row's y (RANGE frame ending at
   * -1) and equals the max y at its own x (same-x domination).
   */
  /**
   * CHI-SQUARE test of independence between two categorical columns —
   * the experiment-analysis primitive ("does variant correlate with
   * outcome"): observed cell counts vs the independence expectation
   * e = rowTotal·colTotal/n, statistic Σ (o−e)²/e. Emits one row
   * (n, n_cells, dof, chi2); the caller compares chi2 against the
   * χ²(dof) critical value (p-values need the incomplete gamma, which
   * is NOT cross-engine reproducible — the statistic is).
   *
   * Deterministic: all counts exact integers; each cell's term rounds
   * to 8dp and sums through DECIMAL, so partition order can't wiggle
   * the statistic.
   *
   * NULL categories are EXCLUDED (both columns must be non-null): a
   * null is an absent observation, not a category. Keeping the
   * null-keyed groups would inflate the marginals/dof/n while the
   * null-unsafe grid join could never match them back — silently
   * distorting the statistic on any nullable input.
   *
   * Scale: one (a, b) cell aggregate (contingency-sized) + two marginal
   * rollups + a 1-row total broadcast — the corpus streams once.
   */
  def chiSquareIndependence(df: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 8)
    val obs = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy("__a").agg(sum(col("o")).as("ra"))
    val rb = obs.groupBy("__b").agg(sum(col("o")).as("rb"))
    val tot = obs.agg(sum(col("o")).as("n"))
    val dof = ra.agg(count(lit(1)).as("ka"))
      .crossJoin(broadcast(rb.agg(count(lit(1)).as("kb"))))
      .select(col("ka"), col("kb"),
        (((col("ka") - 1) * (col("kb") - 1))).as("dof"))
    // EVERY marginal cell participates — an observed-pairs-only sum
    // silently drops the (0 − e)²/e terms of empty cells, understating
    // the statistic exactly where dependence is strongest
    val cells = ra.crossJoin(rb)
      .join(obs, Seq("__a", "__b"), "left")
      .select(col("ra"), col("rb"), coalesce(col("o"), lit(0L)).as("o"))
    val e = col("ra").cast("double") * col("rb") / col("n")
    cells.crossJoin(broadcast(tot))
      .select(col("n"),
        round((col("o") - e) * (col("o") - e) / e, 8).cast(dec).as("__t"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_cells"),
        sum(col("__t")).cast("double").as("chi2"))
      .crossJoin(broadcast(dof))
      .select(col("n"), col("n_cells"), col("dof"), col("chi2"))
  }

  /**
   * Two-sample KOLMOGOROV–SMIRNOV statistic — max |F_A(v) − F_B(v)| over
   * the observed support: the exact "are these two slices drawn from the
   * same distribution" number for numeric columns (the distribution
   * complement of [[QualityCheck.driftPsi]]'s binned shape test; KS
   * needs no binning choice). Emits one row (n_a, n_b, ks_stat, at_v =
   * the smallest value attaining the max — the WHERE of the divergence).
   *
   * Deterministic: CDF steps are exact-integer-count ratios rounded to
   * 8dp before the max; the argmax value ties to the smallest v.
   *
   * Scale: one distinct-value aggregate + a cumulative window over the
   * SORTED DISTINCT support. The window is a single global order — fine
   * for integer-cent/binned columns (bounded support); pre-round/bin
   * continuous doubles first, exactly as any production KS does.
   */
  def ksStatistic(df: DataFrame, valueCol: String, groupCol: String,
                  groupA: String, groupB: String): DataFrame = {
    val counts = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val w = Window.orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(tot))
      // an EMPTY sample (misspelled group value, empty slice) has no CDF —
      // emit no row rather than the Infinity/NaN a bare division yields
      // (the degenerate-input convention clusterAgreement documents)
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("v"), col("na"), col("nb"),
        sum(col("ca")).over(w).as("cca"), sum(col("cb")).over(w).as("ccb"))
      .select(col("v"), col("na"), col("nb"),
        round(abs(col("cca").cast("double") / col("na") -
          col("ccb").cast("double") / col("nb")), 8).as("d"))
      .orderBy(col("d").desc, col("v").asc)
      .limit(1)
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("d").as("ks_stat"), col("v").as("at_v"))
  }

  /**
   * WILSON score interval for per-group success rates — the confidence
   * band an experiment dashboard puts around a conversion rate. Unlike
   * the naive normal interval, Wilson stays inside [0, 1] and behaves at
   * small n / extreme p — the standard choice for rate reporting.
   *
   * `successCol` must be boolean. Emits (groupCol, n, k, rate, lo, hi),
   * rate/bounds 6dp. Deterministic: k and n are exact integers and the
   * interval is one fixed-order double expression per group row.
   *
   * Scale: one partial+final aggregate; the arithmetic runs on the
   * |groups|-row result.
   */
  def wilsonInterval(df: DataFrame, groupCol: String, successCol: String,
                     z: Double = 1.96): DataFrame = {
    val agg = df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("k"))
    val n = col("n"); val k = col("k")
    // all arithmetic in DOUBLE: the long product 4·n·n overflows (and
    // under ANSI, throws) above ~1.5e9-row groups — the same overflow
    // discipline that routes gini's rank×cents through DECIMAL
    val nD = n.cast("double")
    val p = k.cast("double") / nD
    val denom = lit(1.0) + lit(z) * lit(z) / nD
    val center = p + lit(z) * lit(z) / (lit(2.0) * nD)
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z) * lit(z) / (lit(4.0) * nD * nD))
    agg.select(col(groupCol), n, k,
      round(p, 6).as("rate"),
      round((center - half) / denom, 6).as("lo"),
      round((center + half) / denom, 6).as("hi"))
  }

  /**
   * GINI coefficient per group — how CONCENTRATED a (non-negative)
   * quantity is: 0 = perfectly even, →1 = one member owns everything.
   * The corpus-health number behind "is our training data dominated by
   * three domains" and the revenue-concentration number behind "do five
   * customers carry this segment". Uses the rank formula
   * G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending values.
   *
   * Returns (groupCol, n, total, gini) — total is the exact integer-
   * cent sum cast back to double, gini 6dp; single-member groups emit
   * gini 0.
   *
   * Deterministic: values route through integer cents; Σ i·xᵢ is
   * invariant to tie ORDER among equal values (equal x at swapped ranks
   * contribute the same sum), so no cross-engine tie hazard exists; the
   * two sums ride DECIMAL.
   *
   * Scale: one shuffle on the group + a per-group ranking — the same
   * cost class as any per-group percentile; at extreme group sizes the
   * binned approximation (Lorenz curve from an equi-depth histogram)
   * drops in.
   */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 0)
    val w = Window.partitionBy(groupCol).orderBy(col("__x").asc)
    val ranked = df
      .select(col(groupCol), cents(col(valueCol)).as("__x"))
      .filter(col("__x").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
    // rank × cents multiplies IN decimal — the long product overflows
    // (and under ANSI, throws) at big-group × big-value combinations
    // the decimal sum is supposed to survive
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__i").cast(dec) * col("__x").cast(dec)).as("__six"))
      .select(col(groupCol), col("n"),
        (col("__sx").cast("double") / 100).as("total"),
        when(col("n") === 1 || col("__sx") === 0, lit(0.0))
          .otherwise(round(
            (lit(2) * col("__six") - (col("n") + 1) * col("__sx"))
              .cast("double") /
              (col("n") * col("__sx")).cast("double"), 6)).as("gini"))
  }

  /**
   * CATEGORICAL entropy per group — the balance/diversity audit: per
   * group, the Shannon entropy (nats) of its category distribution plus
   * the ln(k)-normalized EVENNESS in [0, 1]. "Is this crawl domain
   * monolingual", "does this user do one thing or many" — the
   * distributional complement of [[gini]]'s concentration-of-mass view
   * (gini weighs a quantity, entropy weighs category membership).
   *
   * Returns (groupCol, n, n_cats, entropy, evenness), 6dp; single-
   * category groups emit entropy 0 and evenness 1 (a one-category
   * distribution is maximally even over its support).
   *
   * Deterministic: category counts are exact integers; each −p·ln(p)
   * term rounds to 8dp and sums through DECIMAL, so partition order
   * can't wiggle the sum (the charEntropy discipline, per group).
   *
   * Scale: one (group, category) aggregate + a group rollup — both
   * partial-aggregating, output group-cardinality sized.
   */
  def categoricalEntropy(df: DataFrame, groupCol: String,
                         catCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 8)
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__k"))
    val withN = counts
      .withColumn("__n", sum(col("__k")).over(
        Window.partitionBy(groupCol)))
    val p = col("__k").cast("double") / col("__n")
    withN
      .select(col(groupCol), col("__n"),
        round(-p * log(p), 8).cast(dec).as("__t"))
      .groupBy(groupCol, "__n")
      .agg(count(lit(1)).as("n_cats"),
        sum(col("__t")).cast("double").as("__h"))
      .select(col(groupCol), col("__n").as("n"), col("n_cats"),
        round(col("__h"), 6).as("entropy"),
        when(col("n_cats") === 1, lit(1.0))
          .otherwise(round(col("__h") /
            log(col("n_cats").cast("double")), 6)).as("evenness"))
  }

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def pass(d: DataFrame, part: Column): DataFrame = {
      val tagged = d.withColumn("_p", part)
      val strictPrev = Window.partitionBy(col("_p")).orderBy(col(xCol).asc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val sameX = Window.partitionBy(col("_p"), col(xCol))
      tagged
        .withColumn("_mprev", max(col(yCol)).over(strictPrev))
        .withColumn("_msame", max(col(yCol)).over(sameX))
        .filter((col("_mprev").isNull || col("_mprev") < col(yCol)) &&
          col(yCol) === col("_msame"))
        .drop("_p", "_mprev", "_msame")
    }
    pass(pass(df, spark_partition_id()), lit(1))
  }
}
