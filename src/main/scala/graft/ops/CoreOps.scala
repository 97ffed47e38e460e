package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Core relational operators of the engine — each reproduces a behavior of the
 * reference pipeline (`/root/reference/dag_mgo_pg_schedule_etl_qc.py`, cited as
 * `DAG:NN`) as a pure `DataFrame => DataFrame` transform. No I/O here; sources
 * and sinks live in [[graft.sources]].
 *
 * Scale notes (100 TB design discipline):
 *  - Every operator is a narrow projection/filter unless stated otherwise; the
 *    only wide (shuffling) operators are [[dedupLatest]], [[dedupExact]] and
 *    [[upsert]] (hash-partitioned by key), which is the minimum possible —
 *    keyed merge fundamentally requires co-partitioning by key.
 *  - Nothing here ever calls `collect()` or loops over rows on the driver.
 */
object CoreOps {

  // ---------------------------------------------------------------------------
  // Schema alignment — reference transform_task (DAG:154-190)
  // ---------------------------------------------------------------------------

  /** Column-name normalization: strip / lowercase / spaces→underscores.
    * Reference: `normalize_columns` DAG:62-69 (applied DAG:166).
    * Pure metadata rename — zero execution cost at any scale. */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName): _*)

  def normalizeName(c: String): String =
    c.trim.toLowerCase.replace(" ", "_")

  /** Align a dynamic-schema frame onto a fixed target schema:
    *  - normalize names (DAG:62-69)
    *  - add columns missing in the input as typed nulls (reference guards
    *    `if col in df.columns`, DAG:172,179)
    *  - try_cast present columns to the target type (ObjectId→str DAG:165,
    *    `pd.to_datetime(errors="coerce")` DAG:177-180 — `try_cast` is
    *    null-on-failure under Spark 4's ANSI mode, so the whole NaT fix
    *    DAG:183 disappears)
    *  - project in target order, dropping extras.
    * Narrow, codegen'd; collapses into the scan projection under Catalyst. */
  def alignSchema(df: DataFrame, target: StructType): DataFrame = {
    val normalized = normalizeColumns(df)
    val present = normalized.columns.toSet
    val cols = target.fields.map { f =>
      if (present(f.name)) col(f.name).try_cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    normalized.select(cols.toIndexedSeq: _*)
  }

  // ---------------------------------------------------------------------------
  // Incremental windowed extract — reference extract_mongo_to_staging (DAG:94-148)
  // ---------------------------------------------------------------------------

  /** Half-open logical-date window over any number of timestamp columns:
    * `tsCol ∈ [start, end)` OR'd across columns. Reference: the Mongo `$or` of
    * two `$gte/$lt` ranges on createdAt/updatedAt, DAG:124-129.
    * The predicate is a plain `Column` conjunction → Catalyst pushes it into
    * the parquet scan (row-group min/max skipping), which is what the
    * reference achieves by evaluating the filter server-side in Mongo. */
  def windowPredicate(tsCols: Seq[String], start: String, end: String): Column =
    tsCols
      .map(c => col(c) >= lit(start).cast(TimestampType) &&
                col(c) <  lit(end).cast(TimestampType))
      .reduce(_ || _)

  /** O1+O2+O3+O4 (DAG:94-132): scan + projection + window filter + multi-key
    * deterministic sort. `sortKeys` empty ⇒ no sort (sorting a 100 TB extract
    * is a global range-shuffle; only ask for it when the consumer needs it). */
  def windowedExtract(
      src: DataFrame,
      projectCols: Seq[String],
      tsCols: Seq[String],
      start: String,
      end: String,
      sortKeys: Seq[String] = Nil): DataFrame = {
    val filtered = src
      .filter(windowPredicate(tsCols, start, end))
      .select(projectCols.map(col).toIndexedSeq: _*)
    if (sortKeys.isEmpty) filtered
    else filtered.orderBy(sortKeys.map(col).toIndexedSeq: _*)
  }

  // ---------------------------------------------------------------------------
  // JSON flatten — reference JSONB `->>` extraction (DAG:296-307) and
  // nested-value serialization (DAG:71-74,171-173)
  // ---------------------------------------------------------------------------

  /** Extract scalar keys out of a JSON-string column into top-level columns
    * (`createdby ->> 'id' AS createdby_id` … DAG:296-307).
    * `get_json_object` is a codegen'd built-in — stays inside whole-stage
    * codegen, no UDF. */
  def flattenJson(df: DataFrame, jsonCol: String, keys: Seq[String]): DataFrame =
    df.withColumns(
      keys.map(k => s"${jsonCol}_$k" -> get_json_object(col(jsonCol), s"$$.$k")).toMap)

  /** Typed variant: parse the JSON column once with an explicit schema and
    * flatten the struct fields (`from_json` + field access). Preferred at
    * scale over repeated `get_json_object` calls (single parse). */
  def flattenJsonTyped(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    val parsed = df.withColumn(s"__${jsonCol}_parsed", from_json(col(jsonCol), schema))
    schema.fields.foldLeft(parsed) { (acc, f) =>
      acc.withColumn(s"${jsonCol}_${f.name}", col(s"__${jsonCol}_parsed").getField(f.name))
    }.drop(s"__${jsonCol}_parsed")
  }

  /** Inverse: serialize struct/array columns to JSON strings ("one cell = one
    * value", DAG:169-173 `clean_value`). */
  def serializeNested(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map(c => c -> to_json(col(c))).toMap)

  // ---------------------------------------------------------------------------
  // Lineage — run_id tagging (DAG:184) and run-scoped selection (DAG:310)
  // ---------------------------------------------------------------------------

  /** Tag every row with the run id (DAG:184). The run_id column doubles as the
    * staging partition key, which is what makes the reference's deadlock-safe
    * run-scoped delete (DAG:4,320) a metadata-only partition drop here. */
  def tagRun(df: DataFrame, runId: String): DataFrame =
    df.withColumn("run_id", lit(runId))

  /** Run-scoped selection (DAG:310 `WHERE airflow_run_id = %s`). With run_id
    * as a partition column this is pruned to a directory listing. */
  def selectRun(df: DataFrame, runId: String): DataFrame =
    df.filter(col("run_id") === lit(runId))

  // ---------------------------------------------------------------------------
  // Dedup — generalization of the reference's keyed idempotency (DAG:279-316)
  // ---------------------------------------------------------------------------

  /** Keep exactly one row per key set (arbitrary but deterministic: the row
    * with the smallest tieBreak value). One hash shuffle on `keys`. */
  def dedupExact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Latest-version-per-key: `row_number() over (partition by key order by
    * versionCol desc, key desc) = 1`. This is the Spark-shaped heart of the
    * reference's `ON CONFLICT DO UPDATE` (DAG:311): the newest row wins.
    * One hash shuffle on `key`; AQE handles skewed keys. */
  def dedupLatest(df: DataFrame, key: String, versionCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---------------------------------------------------------------------------
  // Upsert — reference merge SQL (DAG:279-316)
  // ---------------------------------------------------------------------------

  /**
   * Keyed merge with PARTIAL update set, exactly mirroring
   * `INSERT … ON CONFLICT (_id) DO UPDATE SET address, country, updatedat,
   * requestparams` (DAG:311-315): for keys present in both, only
   * `updateCols` take the update's value — every other column keeps the
   * target's value; keys only in `updates` are inserted whole; keys only in
   * `target` pass through untouched.
   *
   * Physical shape: one full-outer hash join on `key` (sort-merge or
   * broadcast if `updates` is small — Catalyst/AQE decides), then a narrow
   * projection of coalesce/when. No second pass, no union of three legs.
   * At 100 TB the incremental `updates` side is typically ≪ target, so AQE
   * converts this to a broadcast join for free.
   *
   * Requires `updates` to be unique per key (apply [[dedupLatest]] first if
   * not — the reference guarantees this upstream via Mongo `_id` uniqueness).
   */
  def upsert(target: DataFrame, updates: DataFrame, key: String,
             updateCols: Seq[String]): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"upsert: schemas must match: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val updateSet = updateCols.toSet
    val t = target.alias("t")
    val u = updates.alias("u")
    val matched = col(s"u.$key").isNotNull && col(s"t.$key").isNotNull
    val outCols = target.columns.toIndexedSeq.map {
      case k if k == key => coalesce(col(s"t.$k"), col(s"u.$k")).as(k)
      case c if updateSet(c) =>
        // on conflict the update wins; insert-only rows take u; target-only keep t
        when(col(s"u.$key").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
      case c =>
        // non-update column: target wins on conflict AND for target-only rows;
        // only pure inserts take the update's value
        when(matched, col(s"t.$c"))
          .otherwise(coalesce(col(s"t.$c"), col(s"u.$c"))).as(c)
    }
    t.join(u, col(s"t.$key") === col(s"u.$key"), "full_outer").select(outCols: _*)
  }

  // ---------------------------------------------------------------------------
  // Reconciliation — row_count_reconciliation (DAG:375-422)
  // ---------------------------------------------------------------------------

  /** Source-vs-sink count reconciliation for one logical window/run
    * (DAG:394-420). Returns a 1-row frame `(src_count, dst_count, ok)` —
    * computed as two scalar aggregates cross-joined, so the whole check is one
    * job with two parallel count legs, no driver-side collect until the caller
    * acts on it. */
  def reconcile(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.agg(count(lit(1)).as("src_count"))
    val d = dst.agg(count(lit(1)).as("dst_count"))
    s.crossJoin(d).withColumn("ok", col("src_count") === col("dst_count"))
  }

  /** Hard-fail variant mirroring the reference's `raise AirflowException`
    * (DAG:417-420). */
  def reconcileOrThrow(src: DataFrame, dst: DataFrame): (Long, Long) = {
    val row = reconcile(src, dst).head()
    val (sc, dc) = (row.getLong(0), row.getLong(1))
    if (sc != dc)
      throw new IllegalStateException(s"reconciliation failed: src=$sc dst=$dc")
    (sc, dc)
  }
}
