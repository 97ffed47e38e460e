package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture operators: SCD Type-2 history construction and
 * snapshot diffing. Both generalize the reference pipeline's incremental
 * upsert boundary (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:279-316`
 * — the ON CONFLICT partial-update merge overwrites history; warehouses
 * that need "state as of any past run" keep the Type-2 form instead, and
 * the extract side of that merge is exactly a snapshot diff).
 *
 * Scale notes: `scd2History` is one hash shuffle on the entity key (both
 * window passes and the collapse reuse it); `snapshotDiff` is one
 * full-outer hash join on the key with all value columns packed into one
 * struct per side — no per-column joins, no driver collection. Both
 * partition by entity key, so a 100 TB history builds per-partition.
 */
object CdcOps {

  /**
   * SCD Type-2 history from an ordered change stream: collapse consecutive
   * equal values of `attr` per `key` (ordered by `ts`, ties by `tieBreak`)
   * into versioned validity ranges. Emits one row per (key, version) with
   * `valid_from` (first ts carrying the value), `valid_to` (start of the
   * next version, null while current) and `is_current`.
   *
   * Null-safe: a null attr value is a real version (null <=> null holds,
   * so consecutive nulls collapse). One shuffle on `key`: the change-flag
   * window, the running version sum, the collapse aggregate, and the
   * `valid_to` lead all cluster by it (the collapse groups by
   * (key, version), a refinement Catalyst satisfies without re-shuffling
   * under the same hash when AQE coalesces; worst case one extra exchange
   * of version-count-sized rows, never of the raw stream).
   */
  def scd2History(df: DataFrame, key: String, attr: String, ts: String,
                  tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tieBreak).asc)
    val versioned = df
      .select(col(key), col(attr), col(ts), col(tieBreak))
      .withColumn("_chg",
        when(!(col(attr) <=> lag(col(attr), 1).over(w)), 1L).otherwise(0L))
      // row 1 has lag=null → <=> is false for non-null attr, but a null
      // attr on row 1 would compare equal to the null lag marker — force
      // the first row to open version 1 regardless
      .withColumn("_chg",
        when(row_number().over(w) === 1, 1L).otherwise(col("_chg")))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val collapsed = versioned
      .groupBy(col(key), col("version"))
      // attr is constant within a (key, version) group by construction
      .agg(first(col(attr)).as(attr), min(col(ts)).as("valid_from"))
    val wv = Window.partitionBy(key).orderBy(col("version").asc)
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /**
   * Snapshot diff — the CDC extract: compare two keyed snapshots with
   * identical schemas and emit one row per changed key with `change_type`
   * `I` (only in `after`), `D` (only in `before`) or `U` (present in both
   * with any value column differing null-safely), plus `changed_cols`
   * (comma-joined names in declared column order, `U` rows only).
   * Unchanged keys are dropped.
   *
   * One full-outer hash join on `key`; each side's value columns ride as a
   * single struct, so column count never multiplies the join. This is the
   * general form of the reference's "re-extract the updated window and
   * upsert" increment: diffing yesterday's mart against today's staging
   * yields exactly the rows the merge must touch.
   */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   key: String): DataFrame = {
    require(before.columns.sameElements(after.columns),
      s"snapshot schemas differ: ${before.columns.mkString(",")} vs " +
        after.columns.mkString(","))
    val valueCols = before.columns.filter(_ != key).toSeq
    val b = before.select(col(key).as("_k"),
      struct(valueCols.map(col): _*).as("_old"))
    val a = after.select(col(key).as("_k"),
      struct(valueCols.map(col): _*).as("_new"))
    val changeType = when(col("_old").isNull, lit("I"))
      .when(col("_new").isNull, lit("D"))
      .otherwise(lit("U"))
    val changedCols = concat_ws(",", array(valueCols.map { c =>
      when(!(col(s"_old.$c") <=> col(s"_new.$c")), lit(c))
    }: _*))
    b.join(a, Seq("_k"), "full_outer")
      .select(col("_k").as(key), changeType.as("change_type"),
        when(changeType === "U", changedCols).otherwise(lit(""))
          .as("changed_cols"))
      .filter(col("change_type") =!= "U" || col("changed_cols") =!= "")
  }

  /**
   * Incremental aggregate-view maintenance: merge a pre-aggregated batch
   * delta into a persisted additive aggregate state (identical schemas:
   * `keys` + measure columns, every measure additive — counts, decimal
   * sums). Union + one re-aggregation; each measure is summed and cast
   * back to its declared type, so the state schema is a fixed point under
   * repeated merges (Spark's sum() widens decimals — unchecked, 38-digit
   * precision caps after a few merges).
   *
   * This is how a 100 TB mart keeps a per-key rollup current: the merge
   * shuffles |state groups| + |delta groups| rows, never raw history —
   * the full recompute re-scans everything every refresh. Exactness is
   * inherited from the measures (decimal sums are order-independent), so
   * merged state is row-identical to the direct aggregate (spec + oracle
   * prove it).
   */
  def mergeAggState(state: DataFrame, delta: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(state.columns.sameElements(delta.columns),
      s"state schemas differ: ${state.columns.mkString(",")} vs " +
        delta.columns.mkString(","))
    val measures = state.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "no measure columns to merge")
    val summed = measures.map(m =>
      sum(col(m)).cast(state.schema(m).dataType).as(m))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(summed.head, summed.tail: _*)
  }
}
