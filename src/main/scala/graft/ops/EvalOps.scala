package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Model-evaluation metrics — the numbers that decide whether a quality
 * classifier is good enough to gate corpus admission: ranking power
 * (ROC-AUC), probability honesty (Brier, reliability bins), and
 * rater agreement (Cohen's kappa). Extends the reference's QC surface
 * (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:333-369` checks data,
 * not models) to the model-audit side a training-data pipeline needs
 * before trusting a learned filter ([[graft.ext.ClassifyOps]] trains
 * and sweeps; this scores).
 *
 * Shared discipline: every metric reduces to exact-integer (or
 * per-row-rounded DECIMAL) sums with at most one double expression on
 * the final aggregated row — partition order can never wiggle a score.
 */
object EvalOps {

  /**
   * Exact ROC-AUC by rank-sum — the Mann–Whitney identity
   * AUC = U⁺/(n⁺·n⁻): the probability a random positive outranks a
   * random negative, with tied scores counting ½ (fractional average
   * ranks, exactly the trapezoidal ROC convention). No curve is
   * materialized and no threshold chosen — AUC of the raw scores.
   * Emits one row (n_pos, n_neg, auc), 8dp; a single-class input emits
   * no row (no ranking question to answer).
   *
   * Deterministic by construction: doubled ranks (see
   * [[StatsOps.doubledRanks]]) keep the rank-sum exact-integer in
   * DECIMAL; the one double division runs on the final row. Exact at
   * any n that fits DECIMAL(38,0) sums (n ≲ 1e18).
   *
   * Scale: one support-sized score histogram + a cumulative window over
   * the SORTED DISTINCT support + a one-row reduce — the corpus streams
   * once and is never sorted. Pre-round unbounded continuous scores
   * (the [[StatsOps.ksStatistic]] convention) to bound the support.
   */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val kept = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
    val counts = kept
      .groupBy(col(scoreCol).as("__v"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("cp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("cn"))
      .withColumn("__t", col("cp") + col("cn"))
    // boundary probe over the RAW scores — the histogram shuffle is not
    // re-evaluated just to sketch its quantiles
    val ranked = StatsOps.doubledRanks(counts, "__v", "__t",
      probe = Some(kept.select(col(scoreCol).as("__v"))))
    val m = ranked.agg(
      sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
      sum(col("cp").cast(dec) * col("__r2").cast(dec)).as("rp2"))
    val np = col("np"); val nn = col("nn")
    // 2U⁺ = 2R⁺ − n⁺(n⁺+1), exact; AUC = 2U⁺ / (2·n⁺·n⁻)
    val u2 = col("rp2") - (np.cast(dec) * (np + 1).cast(dec))
    m.filter(np > 0 && nn > 0)
      .select(np.as("n_pos"), nn.as("n_neg"),
        round(u2.cast("double") /
          (np.cast("double") * nn.cast("double") * 2.0), 8).as("auc"))
  }

  /**
   * BRIER score — mean squared gap between predicted probability and
   * the 0/1 outcome: the strictly-proper scoring rule that punishes
   * both bad ranking AND bad calibration (an always-0.5 model scores
   * 0.25; a perfect one 0). Emits one row (n, brier), 8dp.
   *
   * Deterministic: each (p − y)² rounds to 8dp and sums through
   * DECIMAL; one double division at the end.
   *
   * Scale: one partial+final aggregate, no shuffle beyond it.
   */
  def brierScore(df: DataFrame, probCol: String,
                 labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val y = when(col(labelCol), 1.0).otherwise(0.0)
    df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(round((col(probCol) - y) * (col(probCol) - y), 8)
        .cast(dec).as("__t"))
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("__s"))
      .filter(col("n") > 0)
      .select(col("n"),
        round(col("__s").cast("double") / col("n").cast("double"), 8)
          .as("brier"))
  }

  /**
   * RELIABILITY (calibration) bins — the table behind a reliability
   * diagram: bucket predictions into `bins` equal-width probability
   * bins and compare each bin's mean predicted probability against its
   * realized positive rate. A calibrated model sits on the diagonal;
   * the gap column is the per-bin calibration error a dashboard plots
   * (and Σ n·|gap|/N is ECE, one SUM away). p = 1.0 folds into the top
   * bin (half-open bins, closed at 1). Emits (bin, n, mean_pred,
   * frac_pos, gap) per non-empty bin, 6dp, ordered by bin.
   *
   * Deterministic: per-row probabilities round to 8dp into a DECIMAL
   * sum (float adds never reorder); counts exact.
   *
   * Scale: one |bins|-row aggregate; the corpus streams once.
   */
  def calibrationBins(df: DataFrame, probCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val base = df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(col(probCol) * bins).cast("long"), lit(bins - 1L))
          .as("bin"),
        round(col(probCol), 8).cast(dec).as("__p"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
    base.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__pos"))
      .select(col("bin"), col("n"),
        round(col("__sp").cast("double") / col("n").cast("double"), 6)
          .as("mean_pred"),
        round(col("__pos").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"))
      .withColumn("gap", round(col("mean_pred") - col("frac_pos"), 6))
      .orderBy("bin")
  }

  /**
   * MURPHY DECOMPOSITION of the Brier score — reliability − resolution
   * + uncertainty, over equal-width probability bins: where
   * [[brierScore]] hands back one mingled number, the decomposition
   * says WHY it is what it is — reliability (how far each bin's mean
   * prediction sits from its realized rate — pure miscalibration,
   * fixable by recalibration), resolution (how much the bins' realized
   * rates spread around the base rate — the model's actual
   * discrimination, NOT fixable post-hoc), and uncertainty (the base
   * rate's own irreducible variance). The triage readout before anyone
   * "fixes" a score: high reliability → recalibrate; low resolution →
   * retrain. Emits one row (n, bins, base_rate, reliability,
   * resolution, uncertainty, brier_binned), 8dp, with brier_binned =
   * rel − res + unc (exact over the binned predictions).
   *
   * Deterministic: bin counts/positives exact; bin mean-predictions
   * come from 8dp-rounded decimal sums; per-bin n·(·)² terms round 8dp
   * and sum through DECIMAL over the bins-row table; one pinned double
   * chain on the final row.
   *
   * Scale: one |bins|-row aggregate + a 1-row base-rate broadcast —
   * the [[calibrationBins]] shape; the corpus streams once.
   */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val dec = org.apache.spark.sql.types.DecimalType(28, 8)
    val base = df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(col(probCol) * bins).cast("long"), lit(bins - 1L))
          .as("bin"),
        round(col(probCol), 8).cast(dec).as("__p"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
    val byBin = base.groupBy("bin")
      .agg(count(lit(1)).as("__n"), sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__pos"))
    val tot = byBin.agg(sum(col("__n")).as("n"), sum(col("__pos")).as("__ny"))
    val pb = col("__sp").cast("double") / col("__n").cast("double")
    val ob = col("__pos").cast("double") / col("__n").cast("double")
    val obar = col("__ny").cast("double") / col("n").cast("double")
    val terms = byBin.crossJoin(broadcast(tot))
      .select(col("n"), col("__ny"),
        round(col("__n").cast("double") * (pb - ob) * (pb - ob), 8)
          .cast(dec).as("__rel"),
        round(col("__n").cast("double") * (ob - obar) * (ob - obar), 8)
          .cast(dec).as("__res"))
    terms.groupBy("n", "__ny")
      .agg(count(lit(1)).as("bins"),
        sum(col("__rel")).as("__srel"), sum(col("__res")).as("__sres"))
      .filter(col("n") > 0)
      .select(col("n"), col("bins"),
        round(obar, 8).as("base_rate"),
        round(col("__srel").cast("double") / col("n").cast("double"), 8)
          .as("reliability"),
        round(col("__sres").cast("double") / col("n").cast("double"), 8)
          .as("resolution"),
        round(obar * (lit(1.0) - obar), 8).as("uncertainty"),
        round(col("__srel").cast("double") / col("n").cast("double") -
          col("__sres").cast("double") / col("n").cast("double") +
          obar * (lit(1.0) - obar), 8).as("brier_binned"))
  }

  /**
   * COHEN'S KAPPA — agreement between two categorical raters beyond
   * chance: κ = (pₒ − pₑ)/(1 − pₑ), which reduces to the all-integer
   * form (diag·n − Σ rᵃ·rᵇ)/(n² − Σ rᵃ·rᵇ) — the annotation-QC number
   * ("do these two labelers actually agree or just both say 'good' a
   * lot"). NULL in either column excludes the row (the chi² contract).
   * Emits one row (n, po, pe, kappa), po/pe 6dp, κ 8dp. Degenerate
   * chance-perfect inputs (pₑ = 1, i.e. both raters constant): κ is 1
   * if they agree on the constant, NULL otherwise (0/0 has no value).
   *
   * Deterministic by construction: diag, marginal products, and n are
   * exact integers in DECIMAL; each emitted ratio is one double
   * division on the final row.
   *
   * Scale: one (a, b) cell aggregate + marginal rollups — identical
   * shape to [[StatsOps.chiSquareIndependence]]; the corpus streams
   * once.
   */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val obs = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy("__a").agg(sum(col("o")).as("ra"))
    val rb = obs.groupBy("__b").agg(sum(col("o")).as("rb"))
    // Σ rᵃ·rᵇ over the label pairs BOTH raters use — categories only
    // one rater emits contribute 0 to pₑ (their partner marginal is 0),
    // so the inner join over shared labels is exact
    val s = ra.join(rb, col("__a") === col("__b"))
      .agg(coalesce(sum(col("ra").cast(dec) * col("rb").cast(dec)),
        lit(0).cast(dec)).as("s"))
    val diag = obs
      .agg(sum(col("o")).as("n"),
        sum(when(col("__a") === col("__b"), col("o")).otherwise(0L))
          .as("diag"))
    val n2 = col("n").cast(dec) * col("n").cast(dec)
    val dn = col("diag").cast(dec) * col("n").cast(dec)
    diag.crossJoin(broadcast(s))
      .filter(col("n") > 0)
      .select(col("n"),
        round(col("diag").cast("double") / col("n").cast("double"), 6)
          .as("po"),
        round(col("s").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6).as("pe"),
        when(n2 - col("s") > 0,
          round((dn - col("s")).cast("double") /
            (n2 - col("s")).cast("double"), 8))
          .otherwise(when(col("diag") === col("n"), lit(1.0))
            .otherwise(lit(null).cast("double"))).as("kappa"))
  }

  /**
   * ISOTONIC CALIBRATION over score bins — the FIX beside
   * [[calibrationBins]]' diagnosis and the ECE scalar: fit the
   * monotone-nondecreasing rate curve closest (L²) to the observed
   * per-bin rates, the standard recalibration map (isotonic regression
   * beats Platt scaling off sigmoid-shaped miscalibration and assumes
   * nothing). A model can then serve `calibrated` instead of its raw
   * score.
   *
   * Emits per present bin: (bin, n, k, rate raw, calibrated 6dp —
   * monotone in bin). Fitted via the MINIMAX characterization
   * iso(i) = min_{k ≥ i} max_{j ≤ i} mean(y over bins j..k), which is
   * closed-form over the bin grid — the sequential
   * pool-adjacent-violators loop replays as two windows and a min,
   * so it is partition-invariant and SQL-replayable where PAV's
   * while-loop is neither.
   *
   * Deterministic: bin counts are exact integers; every block mean is
   * one double division of integer prefix-sums; minimax compares
   * identical doubles in both engines.
   *
   * Scale: one bin aggregate over the corpus (partial-aggregating,
   * `bins`-bounded output); the grid is bins² TINY rows (broadcast
   * nested loop by construction) — never a corpus-sized join.
   */
  def isotonicCalibration(df: DataFrame, probCol: String,
                          labelCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 50, s"bad bins $bins")
    // unpartitioned window BOUND: ≤`bins` (≤50) calibration-bin rows
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
    val wc = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    // null contract shared with calibrationBins/brierScore/rocAuc: rows with
    // a null LABEL are excluded too — the fit must be estimated over the
    // same population the diagnosis scored, or a recalibration readout
    // compares an isotonic map against bin rates it was never fitted to
    val cum = df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(least(floor(col(probCol) * bins), lit(bins - 1))
        .cast("long").as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum(col("y")).as("k"))
      .select(col("bin"), col("n"), col("k"),
        sum(col("n")).over(wc).as("cn"), sum(col("k")).over(wc).as("ck"),
        row_number().over(w).as("pos"))
    val lo = cum.select(col("pos").as("jpos"),
      (col("cn") - col("n")).as("cnj"), (col("ck") - col("k")).as("ckj"))
    val hi = cum.select(col("pos").as("kpos"), col("cn").as("cnk"),
      col("ck").as("ckk"))
    val grid = hi.join(broadcast(lo), col("jpos") <= col("kpos"))
      .select(col("kpos"), col("jpos"),
        ((col("ckk") - col("ckj")).cast("double") /
          (col("cnk") - col("cnj"))).as("mean"))
    val wMax = org.apache.spark.sql.expressions.Window
      .partitionBy("kpos").orderBy(col("jpos").asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val iso = grid
      .select(col("kpos"), col("jpos").as("ipos"),
        max(col("mean")).over(wMax).as("mx"))
      .groupBy("ipos").agg(min(col("mx")).as("__iso"))
    cum.join(iso, cum("pos") === iso("ipos"))
      .select(col("bin"), col("n"), col("k"),
        round(col("k").cast("double") / col("n"), 6).as("rate"),
        round(col("__iso"), 6).as("calibrated"))
      .orderBy("bin")
  }

  /**
   * AVERAGE OVERLAP between two top-`depth` rankings — Webber's
   * intersection metric, the building block under RBO: AO =
   * (1/D)·Σ_{d=1..D} |A_d ∩ B_d|/d, the depth-averaged prefix
   * agreement. The ranking-churn audit: did the top terms / top
   * retrieval results / top customers actually change between two
   * sources, snapshots, or model versions — position-aware where plain
   * set overlap treats rank 1 and rank D alike. 1 = identical
   * rankings, 0 = disjoint.
   *
   * Inputs carry (idCol, rankCol with ranks 1..depth — each side's
   * top-`depth` list). One row: (depth, n_common, avg_overlap 6dp).
   *
   * Deterministic BY CONSTRUCTION, not by luck: the per-item identity
   * Σ_d X_d/d = Σ_items (H_D − H_{m−1}) (m = the item's max rank; it
   * counts toward every prefix d ≥ m) turns the depth sum into one
   * weight per common item, and those harmonic weights are DRIVER
   * literals — the same 12dp-rounded decimals ride this plan and the
   * SQL oracle ([[harmonicWeightSqlCase]]), so both engines sum an
   * identical multiset of decimals in any order.
   *
   * Scale: one equi-join of two depth-sized lists + a 1-row aggregate;
   * the weight lookup is a literal CASE chain, zero shuffle.
   */
  def averageOverlap(a: DataFrame, b: DataFrame, idCol: String,
                     rankCol: String, depth: Int): DataFrame = {
    val w = harmonicWeights(depth)
    val dec = org.apache.spark.sql.types.DecimalType(20, 12)
    val joined = a
      .select(col(idCol).as("__id"), col(rankCol).as("__ra"))
      .filter(col("__ra") <= depth)
      .join(b.select(col(idCol).as("__id"), col(rankCol).as("__rb"))
        .filter(col("__rb") <= depth), "__id")
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
    val weight = w.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (wm, i)) => when(col("__m") === (i + 1), lit(wm))
        .otherwise(acc)
    }
    joined.select(weight.cast(dec).as("__w"))
      .agg(count(lit(1)).as("n_common"), sum(col("__w")).as("__s"))
      .select(lit(depth).cast("long").as("depth"), col("n_common"),
        coalesce(round(col("__s").cast("double") / depth, 6), lit(0.0))
          .as("avg_overlap"))
  }

  /** The 12dp harmonic tail weights H_D − H_{m−1} for m = 1..depth —
    * shared verbatim by [[averageOverlap]] and its SQL oracle. */
  private[graft] def harmonicWeights(depth: Int): Seq[Double] = {
    require(depth >= 1 && depth <= 1000, s"bad depth $depth")
    val h = new Array[Double](depth + 1)
    var k = 1
    while (k <= depth) { h(k) = h(k - 1) + 1.0 / k; k += 1 }
    (1 to depth).map(m => BigDecimal(h(depth) - h(m - 1))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** `CASE m WHEN 1 THEN <w1> …` replaying [[harmonicWeights]]'s exact
    * literals in SQL. */
  private[graft] def harmonicWeightSqlCase(mExpr: String,
                                           depth: Int): String =
    harmonicWeights(depth).zipWithIndex.map { case (wm, i) =>
      s"WHEN $mExpr = ${i + 1} THEN CAST(${BigDecimal(wm)} AS DECIMAL(20,12))"
    }.mkString("CASE ", " ", " END")
}
