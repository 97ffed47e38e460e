package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality checks — the engine-native replacement for the
 * reference's `soda scan` subprocess gate
 * (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:333-369`, "DAG:NN" below).
 * The author declares the check set at DAG:369: "data freshness, valid data
 * type, regex check, unique, and not missing fields value check".
 *
 * Design: every rule compiles to aggregate `Column`s, and [[report]] runs ALL
 * rules in ONE aggregation pass over the data — a single scan + single partial/
 * final hash-agg, which is the only shape that is acceptable at 100 TB (Soda
 * issues one SQL query per check; N checks = N scans — we refuse to inherit
 * that). No UDAF needed: built-in aggregates compose.
 */
object QualityCheck {

  /** Referential-integrity check (the one declared-check class that can't
    * ride in the single-pass aggregate — it needs a join): count of child
    * rows whose `childKey` has no match in `parent.parentKey`. Implemented
    * as a left-anti join (shuffle or broadcast per Catalyst's choice) +
    * count — at 100 TB the parent side's distinct keys usually broadcast.
    * Returns a 1-row frame (rule, violations). */
  def referentialIntegrity(child: org.apache.spark.sql.DataFrame,
                           childKey: String,
                           parent: org.apache.spark.sql.DataFrame,
                           parentKey: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(keys, col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"fk_${childKey}_refs_$parentKey").as("rule"),
        col("violations"))
  }

  sealed trait Rule {
    def name: String
    /** Aggregate column counting VIOLATIONS (0 = pass). */
    def violations: Column
    /** Row-level pass predicate (null-safe; true = row passes), when the
      * rule is row-expressible — drives [[quarantine]]. Dataset-level rules
      * (uniqueness, freshness) return None: a single row can't violate
      * them alone. */
    def rowCheck: Option[Column] = None
  }

  /** "not missing fields value check" (DAG:369). */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null_$column"
    def violations: Column = sum(when(col(column).isNull, 1L).otherwise(0L))
    override def rowCheck: Option[Column] = Some(col(column).isNotNull)
  }

  /** "unique" (DAG:369) — key uniqueness as count − distinct-count. */
  final case class Unique(column: String) extends Rule {
    val name = s"unique_$column"
    def violations: Column = count(col(column)) - countDistinct(col(column))
  }

  /** "regex check" (DAG:369) — non-null values must match. */
  final case class Regex(column: String, pattern: String) extends Rule {
    val name = s"regex_$column"
    def violations: Column =
      sum(when(col(column).isNotNull && !col(column).rlike(pattern), 1L).otherwise(0L))
    override def rowCheck: Option[Column] =
      Some(col(column).isNull || col(column).rlike(pattern))
  }

  /** "valid data type" (DAG:369) — value must survive a cast (the engine-side
    * analog of `pd.to_datetime(errors="coerce")` DAG:177-180: coercion
    * failures surface as nulls, which we count). */
  final case class ValidType(column: String, castTo: String) extends Rule {
    val name = s"type_${column}_$castTo"
    def violations: Column =
      sum(when(col(column).isNotNull && col(column).try_cast(castTo).isNull, 1L)
        .otherwise(0L))
    override def rowCheck: Option[Column] =
      Some(col(column).isNull || col(column).try_cast(castTo).isNotNull)
  }

  /** "data freshness" (DAG:369) — newest timestamp must be ≥ threshold. */
  final case class Freshness(tsColumn: String, minTs: java.sql.Timestamp) extends Rule {
    val name = s"freshness_$tsColumn"
    def violations: Column =
      when(max(col(tsColumn)) >= lit(minTs), 0L).otherwise(1L)
  }

  /** Arbitrary row-predicate rule: count rows violating `mustHold`. A NULL
    * predicate result (NULL operand in the expression) counts as a violation
    * on BOTH surfaces — the aggregate gate here and [[quarantine]]'s row
    * check — so the gate and the side-output always agree on the same row. */
  final case class Predicate(name: String, mustHold: Column) extends Rule {
    def violations: Column =
      sum(when(!coalesce(mustHold, lit(false)), 1L).otherwise(0L))
    override def rowCheck: Option[Column] = Some(coalesce(mustHold, lit(false)))
  }

  /**
   * Row-level quarantine — the "side output" pattern: instead of hard-failing
   * the whole run on any violation ([[check]]'s gate semantics), tag each row
   * with the FIRST row-expressible rule it violates (`qc_fail_reason`, null =
   * clean) so callers route clean rows onward and quarantined rows to a dead
   * letter sink. Pure per-row projection — zero shuffle, runs in the scan
   * stage; dataset-level rules (unique/freshness) stay in the [[report]]
   * aggregate where they belong.
   */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val reason = rules.flatMap(r => r.rowCheck.map(c => (r.name, c)))
      .foldRight(lit(null).cast("string")) { case ((name, holds), acc) =>
        when(!holds, name).otherwise(acc)
      }
    df.withColumn("qc_fail_reason", reason)
  }

  /** The clean side of [[quarantine]]. */
  def passedRows(df: DataFrame, rules: Seq[Rule]): DataFrame =
    quarantine(df, rules).filter(col("qc_fail_reason").isNull)
      .drop("qc_fail_reason")

  /** The dead-letter side of [[quarantine]]. */
  def quarantinedRows(df: DataFrame, rules: Seq[Rule]): DataFrame =
    quarantine(df, rules).filter(col("qc_fail_reason").isNotNull)

  /** One-row wide report: `n_rows`, then one violation-count column per rule.
    * Single aggregation pass regardless of rule count. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => coalesce(r.violations, lit(0L)).as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /**
   * ZERO-EXTRA-PASS QC via Spark's CollectMetrics (`Dataset.observe`):
   * attach the same violation aggregates [[report]] computes to the
   * frame itself — they accumulate as a side-product of whatever action
   * the caller already runs (the mart write, the count), so the QC gate
   * costs NO second scan of the data. [[report]] is the standalone
   * audit; this is the production-write form: at 100 TB a dedicated QC
   * pass is a full extra read of the table.
   *
   * Returns the instrumented frame and the [[Observation]]; after ONE
   * action on the frame, `observation.get` yields the metrics map
   * (`n_rows` + one count per rule, same names/semantics as [[report]]).
   *
   * [[Unique]] rules are REJECTED up front: CollectMetrics forbids
   * distinct aggregates, so uniqueness cannot ride the write — run it
   * through [[report]] (its one extra pass is exactly what a distinct
   * count costs anyway). The default observation name is unique per
   * call, so two instrumented frames can meet in one plan.
   */
  private val obsNames = new java.util.concurrent.atomic.AtomicLong()
  def observed(df: DataFrame, rules: Seq[Rule],
               name: String = ""): (DataFrame, Observation) = {
    require(!rules.exists(_.isInstanceOf[Unique]),
      "Unique needs a distinct aggregate, which CollectMetrics forbids — " +
        "check uniqueness via report() instead")
    val obs = Observation(
      if (name.nonEmpty) name else s"qc_${obsNames.incrementAndGet()}")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => coalesce(r.violations, lit(0L)).as(r.name))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /**
   * Distribution-drift detection between two dataset snapshots —
   * population stability index per bucket: with add-one-smoothed bucket
   * shares `p` (reference) and `q` (current), each bucket contributes
   * `(p − q) · ln(p/q)`; the summed PSI reads ~<0.1 stable, 0.1-0.25
   * moderate, >0.25 action. The standard production monitor for "did this
   * week's data move" — the reference pipeline's count-reconciliation
   * (DAG:375-422) checks volume; this checks SHAPE. Smoothing over the
   * union bucket set keeps every term finite and, being exact integer
   * arithmetic, cross-engine deterministic.
   *
   * Returns one row per bucket (p, q, contribution) — ORDER BY bucket and
   * sum `psi_term` for the index. Scale: two bucket-count aggregates
   * (partial+final, bucket-sized output) + a bucket-sized full-outer
   * join + 1-row totals broadcast. The rows themselves never shuffle.
   */
  def driftPsi(reference: DataFrame, current: DataFrame,
               bucket: Column): DataFrame =
    driftPsiCounts(
      reference.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("np")),
      current.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("nq")))

  /**
   * [[driftPsi]] from PRE-AGGREGATED bucket counts — `reference` as
   * (bucket, np), `current` as (bucket, nq). The face consumed when the
   * histograms already exist as artifacts (a persisted reference profile,
   * the streaming cell-count state of
   * [[graft.streaming.StreamingPipeline.driftIngest]]) — the PSI then
   * costs a bucket-sized join, no corpus scan at all.
   */
  def driftPsiCounts(reference: DataFrame, current: DataFrame): DataFrame = {
    val p = reference.select(col("bucket"), col("np").cast("long").as("np"))
    val q = current.select(col("bucket"), col("nq").cast("long").as("nq"))
    val joined = p.join(q, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nq"), lit(0L)).as("nq"))
    val totals = joined.agg(sum(col("np")).as("tp"), sum(col("nq")).as("tq"),
      count(lit(1)).as("nb"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("np"), col("nq"),
        ((col("np") + 1).cast("double") / (col("tp") + col("nb"))).as("p"),
        ((col("nq") + 1).cast("double") / (col("tq") + col("nb"))).as("q"))
      .select(col("bucket"), col("np"), col("nq"),
        round(col("p"), 8).as("p"), round(col("q"), 8).as("q"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 8)
          .as("psi_term"))
  }

  /**
   * L-DIVERSITY audit — the release-gate complement of the k-anonymized
   * export: per quasi-identifier cell, the count of DISTINCT sensitive
   * values. A cell can be k-anonymous (many rows) yet leak exactly
   * (every row shares one sensitive value) — l-diversity catches that:
   * cells with fewer than `l` distinct sensitive values fail. Returns
   * (quasiCols…, n_rows, n_sensitive, diverse) for every cell; gate on
   * `diverse` before rows leave the platform.
   *
   * NULL sensitive values carry no DIVERSITY but do carry RELEASE
   * volume: `n_rows` counts every row in the cell (they all leave the
   * platform if the cell passes), while nulls are excluded from
   * `n_sensitive` only (a null is an absent disclosure, not a second
   * value — counting it toward diversity would pass exactly the leaky
   * cell this audit exists to catch; matches SQL `COUNT(*)` vs
   * `COUNT(DISTINCT …)` semantics).
   *
   * Scale: one two-level aggregate — (quasi, sensitive) pre-distinct
   * then the cell rollup — both partial-aggregating; output is
   * cell-cardinality sized.
   */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"bad l=$l")
    val g = quasiCols.map(col)
    val pre = df
      .groupBy(g :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    pre.groupBy(g: _*)
      .agg(sum(col("__c")).as("n_rows"),
        count(col("__s")).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /**
   * FUNCTIONAL-DEPENDENCY profiler — "does X determine Y in this data":
   * per determinant value, the row count and the number of DISTINCT
   * dependent values; `holds` iff at most one. The schema-discovery
   * companion to the declared [[Rule]] checks — run it on a candidate
   * key→attribute pair before hard-coding the dependency into an upsert
   * or join ("is brand→manufacturer actually clean in this feed").
   * NULL determinants are excluded (no identity to determine BY); NULL
   * dependents carry no value and don't count toward `n_dep` (the
   * [[lDiversity]] null contract).
   *
   * Scale: one two-level aggregate — (det, dep) pre-distinct then the
   * det rollup — both partial-aggregating, output |determinants| rows.
   */
  def functionalDependency(df: DataFrame, detCol: String,
                           depCol: String): DataFrame = {
    val pre = df.filter(col(detCol).isNotNull)
      .groupBy(col(detCol), col(depCol).as("__dep"))
      .agg(count(lit(1)).as("__c"))
    pre.groupBy(col(detCol))
      .agg(sum(col("__c")).as("n_rows"),
        count(col("__dep")).as("n_dep"))
      .withColumn("holds", col("n_dep") <= 1)
  }

  /**
   * T-CLOSENESS audit — the third rung of the release ladder after
   * k-anonymity (cell size) and [[lDiversity]] (distinct sensitive
   * values): a cell can pass both yet still leak by SKEW — 90% of its
   * rows sharing one salary band reveals plenty even with l distinct
   * bands present. t-closeness bounds, per quasi-identifier cell, the
   * ORDERED earth-mover's distance between the cell's sensitive-value
   * distribution and the whole table's: EMD = (1/(m−1))·Σᵢ|Σ_{j≤i}
   * (pⱼ−qⱼ)| over the m sorted distinct sensitive values. Cells with
   * EMD > t fail. Emits (quasiCols…, n_rows, emd, pass), emd 8dp; a
   * single-value support (m = 1) has distance 0 by definition.
   *
   * Deterministic by construction: the running sums are kept in the
   * integer units of 1/(n_cell·N) — Σ(cⱼ·N − gⱼ·n_cell) — so every
   * cumulative step and the |·| total are exact DECIMAL integers; one
   * double division per cell row at the end.
   *
   * Scale: two support-sized aggregates + a (cells × support) grid
   * with a per-cell cumulative window. The grid is |cells|·m rows —
   * bin continuous sensitive values first (the ksStatistic convention)
   * so m stays bounded; the corpus itself streams once and never
   * sorts.
   */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0 && t <= 1, s"bad t=$t")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = quasiCols.map(col)
    val base = df.select(g :+ col(sensitiveCol).as("__v"): _*)
      .filter(col("__v").isNotNull)
    val gv = base.groupBy(col("__v")).agg(count(lit(1)).as("__g"))
    val tot = gv.agg(sum(col("__g")).as("__gt"), count(lit(1)).as("__m"))
    val cells = base.groupBy(g :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val cellTot = cells.groupBy(g: _*).agg(sum(col("__c")).as("__n"))
    val grid = cellTot.crossJoin(broadcast(gv))
      .join(cells, quasiCols :+ "__v", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__v").asc)
      .rowsBetween(Long.MinValue, 0)
    val stepped = grid.crossJoin(broadcast(tot))
      .withColumn("__d",
        col("__c").cast(dec) * col("__gt").cast(dec) -
          col("__g").cast(dec) * col("__n").cast(dec))
      .withColumn("__s", sum(col("__d")).over(w))
    stepped
      .groupBy(g ++ Seq(col("__n"), col("__m"), col("__gt")): _*)
      .agg(sum(abs(col("__s"))).as("__sa"))
      .select(g ++ Seq(col("__n").as("n_rows"),
        when(col("__m") > 1,
          round(col("__sa").cast("double") /
            ((col("__m") - 1).cast("double") * col("__n") * col("__gt")), 8))
          .otherwise(lit(0.0)).as("emd")): _*)
      .withColumn("pass", col("emd") <= t)
  }

  /**
   * DIFFERENTIALLY-PRIVATE noisy counts — per-group counts released
   * with Laplace(1/ε) noise, the standard ε-DP mechanism for a count
   * query (sensitivity 1). The noise draw is a PER-KEY PRF, not an
   * ambient RNG: u = (fp60(group‖releaseId)+½)/2⁶⁰ ∈ (0,1) through the
   * Laplace inverse CDF −(1/ε)·sgn(u−½)·ln(1−2|u−½|) — the same
   * reproducible-randomness discipline as the weighted-sampling races
   * ([[graft.ext.SamplingOps.weightedSample]]): reruns and stragglers
   * release identical values, and a re-released count re-uses its noise
   * instead of averaging it away. The flip side is real and documented:
   * DISTINCT releaseIds spend fresh ε each (sequential composition) —
   * rotate the id only when a new release is intended.
   *
   * Deterministic: the fingerprint is cross-engine md5-parity and the
   * one double expression is fixed-order; rounded 6dp.
   *
   * Scale: one partial+final count aggregate plus a per-group scalar
   * projection — no extra shuffle, output |groups| rows.
   */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
                    releaseId: String = "r1"): DataFrame = {
    require(epsilon > 0, s"bad epsilon=$epsilon")
    val scale = 1.0 / epsilon
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val u = (graft.ext.TextOps.fingerprint60(
      concat(col(groupCol).cast("string"), lit(":" + releaseId)))
      .cast("double") + 0.5) / math.pow(2, 60)
    val c = u - 0.5
    val noise = (lit(-scale) * signum(c)) * log(lit(1.0) - lit(2.0) * abs(c))
    counts.select(col(groupCol),
      round(col("__n") + noise, 6).as("noisy_n"),
      lit(epsilon).as("epsilon"))
  }

  /** Gate semantics of the reference: any violation fails the run hard
    * (DAG:361-362 non-zero soda exit → AirflowException). Returns the report
    * row for logging; throws on violation. */
  def check(df: DataFrame, rules: Seq[Rule]): Map[String, Long] = {
    val row = report(df, rules).head()
    val result = row.schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
    val failed = result.view.filterKeys(_ != "n_rows").filter(_._2 != 0L).toMap
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"quality check failed: ${failed.map { case (k, v) => s"$k=$v" }.mkString(", ")}")
    result
  }

  /**
   * Rule-free column profiler — the automatic dataset-card complement to
   * the declared-rules [[report]]: one row per column with row count,
   * null count, and exact distinct cardinality (long format, so any
   * schema profiles into the same shape).
   *
   * ONE aggregation job over the table; the single result row (2·|cols|
   * values — metadata-sized, like the centroid collects) melts on the
   * driver. The multi-`countDistinct` compiles to Catalyst's Expand
   * (|cols|× the scan in shuffle volume) — at extreme widths swap
   * `approx_count_distinct` in per column for a sketch-grade profile,
   * same shape.
   */
  def profileColumns(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = df.columns.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__d"))) :+
      count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val total = row.getAs[Long]("__total")
    df.columns.toSeq.map { c =>
      val nonNull = row.getAs[Long](s"${c}__n")
      (c, total, total - nonNull, row.getAs[Long](s"${c}__d"))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }
}
