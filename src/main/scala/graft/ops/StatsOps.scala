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
