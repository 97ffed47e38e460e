package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Temporal operators beyond vanilla Spark joins: as-of join and
 * sessionization. Both generalize the reference pipeline's event-time
 * handling (`/root/reference/dag_mgo_pg_schedule_etl_qc.py:124-129` — the
 * half-open logical-date window over createdAt/updatedAt is exactly the
 * "latest state as of a point in time" problem that an as-of join solves
 * keyed-per-row).
 *
 * Scale notes: both operators are implemented as ONE hash shuffle on the key
 * (union + window / lag + running sum) — never a per-row range probe or a
 * broadcast nested-loop. This is the canonical distributed as-of shape
 * (kdb/Flink/QuestDB all reduce to merge-within-key); a 100 TB corpus
 * partitions by key and each partition sorts locally.
 */
object TemporalOps {

  /**
   * As-of join: for every left row, attach the single right row with the
   * greatest `rightTs <= leftTs` for the same `key` (ties on `rightTs`
   * broken by the greatest `rightTieBreak` — fully deterministic).
   * Left rows with no prior right row keep nulls (LEFT OUTER semantics).
   *
   * Implementation: tag + union both sides, then one window pass per key
   * ordered by (ts, side, tiebreak) carrying the matched right row forward
   * as a SINGLE struct with one `last(ignoreNulls)` — right rows sort before
   * left rows at equal ts, so the match is inclusive. Carrying one struct
   * (not one `last` per column) guarantees every `asof_` column comes from
   * the SAME right row, and a legitimately-null payload value rides with its
   * owning row instead of resurrecting a stale non-null from an older row.
   * One shuffle on `key`, local sort within partitions; no range join, no
   * nested loop. `rightCols` are the right-side payload columns to carry
   * (emitted with prefix `asof_`).
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightTieBreak: String,
      rightCols: Seq[String]): DataFrame = {
    val carried = (rightCols :+ rightTs).distinct
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    val r0 = right
      .select(col(key), col(rightTs).as("__t"), lit(0).as("__side"),
        col(rightTieBreak).cast("long").as("__tie"),
        struct(carried.map(c => col(c).as(s"asof_$c")): _*).as("__asof"))
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRow = unioned
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    carried.foldLeft(withRow) { (acc, c) =>
        acc.withColumn(s"asof_$c", col("__asof").getField(s"asof_$c"))
      }
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__tie", "__asof")
  }

  /**
   * Sessionize: assign a session id per `key`, starting a new session when
   * the gap since the previous event exceeds `gapSeconds`. Session id is the
   * running count of session starts in (ts, tieBreak) order — deterministic
   * and dense (1, 2, 3 … per key).
   *
   * lag + running sum over the same window = one shuffle on `key`; this is
   * the batch analog of Structured Streaming's session window
   * (`session_window(ts, gap)` covers the streaming path in
   * [[graft.streaming.StreamingPipeline]]'s domain).
   */
  def sessionize(df: DataFrame, key: String, ts: String, tieBreak: String,
                 gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts).asc, col(tieBreak).asc)
    val prevTs = lag(col(ts), 1).over(order)
    val isNew = when(prevTs.isNull ||
      col(ts).cast("long") - prevTs.cast("long") > gapSeconds, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new")
  }

  /**
   * DEBOUNCE — keep only the FIRST event of every burst: an event is
   * suppressed when it lands within `gapSeconds` of its key's previous
   * event (suppressed events still reset the timer, so a long chain of
   * sub-gap events collapses to its head — exactly the first-of-each-
   * [[sessionize]]-session). The telemetry-cleanup primitive: repeated
   * click storms, retry storms, and duplicate beacons reduce to one
   * representative row before anything downstream counts them.
   *
   * Returns the input rows that survive, schema unchanged. Rows with a
   * NULL timestamp (and the rows immediately after them in sort order)
   * are always KEPT: a null gap is not evidence of a burst, and a bare
   * null-propagating filter would silently DELETE the neighbor of every
   * null-ts row.
   *
   * Scale: one hash shuffle on the key + a per-key local sort (the same
   * single window spec as [[sessionize]]); the keep decision is a lag
   * comparison — no second shuffle, no self-join.
   */
  def debounce(df: DataFrame, key: String, ts: String, tieBreak: String,
               gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts).asc,
      col(tieBreak).asc)
    val prevTs = lag(col(ts), 1).over(order)
    df.withColumn("__keep", coalesce(prevTs.isNull ||
        col(ts).cast("long") - prevTs.cast("long") > gapSeconds, lit(true)))
      .filter(col("__keep")).drop("__keep")
  }

  /**
   * TIME-WEIGHTED average per key over irregular samples — the TWAP/
   * telemetry-gauge mean: each sample's value is weighted by how long it
   * was CURRENT (until the next sample), so a gauge that sat at 100 for
   * an hour and 0 for a second averages ≈100, where the naive row mean
   * would say 50. The last sample carries no weight (nothing observed
   * after it); keys with < 2 samples emit no row (no elapsed time).
   *
   * Returns (key, n_samples, span_seconds, twa) — twa 6dp, value cents ×
   * elapsed seconds decimal-summed so partition order can't wiggle it.
   *
   * Scale: one key shuffle + per-key sort (the sessionize window spec) +
   * one aggregation.
   */
  def timeWeightedAvg(df: DataFrame, key: String, ts: String,
                      valueCol: String, tieBreak: String): DataFrame = {
    val dec = DecimalType(28, 0)
    // order by FLOORED seconds (+ tie-break), not the raw timestamp: the
    // weights are floored-second gaps, and sub-second timestamp precision
    // differs across engines (parquet ns vs Spark µs) — raw-ts ordering
    // would pair different weights to different values on sub-µs ties
    val weighted = df
      .filter(col(ts).isNotNull)
      .select(col(key), col(ts).cast("long").as("__t"), col(tieBreak),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__next", lead(col("__t"), 1).over(
        Window.partitionBy(key).orderBy(col("__t").asc,
          col(tieBreak).asc)))
      .filter(col("__next").isNotNull)
      .withColumn("__w", col("__next") - col("__t"))
    weighted.groupBy(key)
      .agg((count(lit(1)) + 1).as("n_samples"),
        sum(col("__w").cast(dec)).as("__span"),
        // multiply IN decimal: the long cents × seconds product can
        // overflow (and under ANSI, throw) on valid inputs
        sum(col("__v").cast(dec) * col("__w").cast(dec)).as("__vw"))
      .filter(col("__span") > 0)
      .select(col(key), col("n_samples"),
        col("__span").cast("long").as("span_seconds"),
        round(col("__vw").cast("double") /
          col("__span").cast("double") / 100, 6).as("twa"))
  }

  /**
   * Point-in-interval join WITHOUT an equi-key: rows of `points` matched to
   * every `intervals` row with `start <= point <= end`. Declared as the
   * plain range-predicate join; [[graft.plans.RewriteIntervalJoin]]
   * (registered here) upgrades the plan from Spark's O(points·intervals)
   * BroadcastNestedLoopJoin to [[graft.plans.IntervalJoinExec]] — broadcast
   * intervals, sorted probe with binary search + max-end prefix,
   * O(log m + matches) per point, zero shuffle of the point side.
   * `intervals` must be broadcast-bounded (calendars, campaigns, validity
   * windows — the realistic shape for a keyless range join).
   */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          pointCol: String, startCol: String,
                          endCol: String): DataFrame = {
    graft.plans.GraftPlanner.register(points.sparkSession)
    points.join(intervals,
      points(pointCol) >= intervals(startCol) &&
      points(pointCol) <= intervals(endCol))
  }

  /** Per-session rollup: bounds, duration, event count. One extra hash agg
    * on (key, session_id) after [[sessionize]]'s shuffle. */
  def sessionStats(df: DataFrame, key: String, ts: String, tieBreak: String,
                   gapSeconds: Long): DataFrame =
    sessionize(df, key, ts, tieBreak, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        (max(col(ts)).cast("long") - min(col(ts)).cast("long"))
          .as("duration_s"),
        count(lit(1)).as("n_events"))

  /**
   * Time-series gap-fill / resample: snap each row to a fixed `interval`
   * grid bucket, keep the LAST observation per (key, bucket) — by
   * (`ts`, `tieBreak`) order, fully deterministic — then materialize every
   * missing grid bucket between each key's first and last observation and
   * forward-fill the value from the most recent observed bucket
   * (`observed = false` marks carried rows). The classic sensor/market-data
   * densification the reference's pandas tier would do with
   * `resample().ffill()`.
   *
   * Scale: one hash agg on (key, bucket) for the last-observation pick
   * (max_by partial-aggregates map-side), one tiny agg for per-key spans,
   * `sequence()` explodes the grid NARROWLY from the span row (never a
   * driver loop), one equi-join on (key, bucket), one window per key for
   * the fill. Grid volume is bounded by span/interval per key — the only
   * watch-item at 100× is a key with a years-long span at fine step, which
   * the caller bounds by choice of `interval`.
   */
  def gapFill(df: DataFrame, key: String, ts: String, tieBreak: String,
              valueCol: String, interval: String): DataFrame = {
    val bucket = date_trunc(interval, col(ts))
    val obs = df
      .groupBy(col(key), bucket.as("bucket"))
      .agg(max_by(col(valueCol), struct(col(ts), col(tieBreak))).as("obs_value"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col(key), explode(sequence(col("b0"), col("b1"),
        expr(s"INTERVAL 1 ${interval.toUpperCase}"))).as("bucket"))
    val w = Window.partitionBy(key).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(key, "bucket"), "left")
      .select(col(key), col("bucket"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value_ff"),
        col("obs_value").isNotNull.as("observed"))
  }

  /**
   * Ordered-step funnel: for each `key`, step i's timestamp is the earliest
   * event matching `steps(i)` that is STRICTLY after step i-1's timestamp
   * (step 0 is the plain minimum). Emits one row per key present in `df`
   * with `step_1_ts … step_n_ts` (null once the funnel breaks) and `depth`
   * = number of steps completed. The standard product-analytics conversion
   * funnel (view → click → purchase).
   *
   * Scale: each step is filter → hash agg on key → equi-join on key — n
   * aggs + n joins for an n-step funnel, every one partial-aggregated and
   * AQE-planned; events are filtered to the step's predicate BEFORE any
   * shuffle, so each pass moves only that step's matching rows, never the
   * corpus. No window over all events, no per-key sort.
   */
  def funnel(df: DataFrame, key: String, ts: String,
             steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step predicate")
    val keys = df.select(col(key)).distinct()
    val stepAggs = steps.zipWithIndex.foldLeft(List.empty[(DataFrame, String)]) {
      case (acc, (pred, i)) =>
        val name = s"step_${i + 1}_ts"
        val stepDf = acc match {
          case Nil =>
            df.filter(pred).groupBy(col(key)).agg(min(col(ts)).as(name))
          case (prev, prevName) :: _ =>
            df.filter(pred)
              .join(prev.select(col(key), col(prevName)), key)
              .filter(col(ts) > col(prevName))
              .groupBy(col(key)).agg(min(col(ts)).as(name))
        }
        (stepDf, name) :: acc
    }.reverse
    val joined = stepAggs.foldLeft(keys) { case (acc, (stepDf, _)) =>
      acc.join(stepDf, Seq(key), "left")
    }
    val depth = stepAggs.map { case (_, name) =>
      when(col(name).isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    joined.withColumn("depth", depth)
  }

  /**
   * CUSUM change-point detection over a daily series — "did this metric's
   * LEVEL shift, and when": cumulative sum of deviations from the global
   * mean, S_i = Σ_{j≤i}(v_j − v̄); the day attaining max |S_i| is the
   * classic CUSUM change-point estimate (the cumulative deviation pivots
   * there), and its magnitude — normalized per day, in value units — is
   * the shift evidence a monitor alarms on. The complement of
   * `q_seasonal_anomaly`'s POINT outliers: CUSUM integrates many small
   * same-direction deviations a per-point z-score never flags.
   *
   * Emits one row (at_day, n_days, cusum_peak, direction): the earliest
   * day attaining the max, the series length, max|S|/n_days in value
   * units (6dp), and 'up' if the pivot ends a below-mean run (level
   * shifted up afterward) — i.e. S at the pivot is negative — else
   * 'down'. Empty input emits no row.
   *
   * Deterministic by construction: daily totals are exact cents; the
   * deviations are kept in units of 1/n_days — d_i = v_i·n − T (T = the
   * grand total) — so every running sum is an exact DECIMAL integer;
   * ties on |S| break to the earliest day.
   *
   * Scale: the corpus pre-aggregates to ONE row per day (partial agg,
   * single shuffle); the cumulative window runs over the day-count-sized
   * series — the [[graft.ops.StatsOps.ksStatistic]] bounded-support
   * discipline.
   */
  /**
   * BURSTINESS of per-key event timing — the Goh–Barabási coefficient
   * B = (σ − μ)/(σ + μ) over each key's inter-event gaps: −1 for a
   * perfectly regular clock, → 0 for Poisson arrivals, → 1 for extreme
   * bursts. The behavioral-timing feature (bot vs human cadence, sensor
   * health) that plain event counts can't see. Keys need ≥ `minGaps`
   * gaps (default 2 — a single gap has no spread); emits (key, n_gaps,
   * mean_gap, burstiness), 6dp, ordered by key.
   *
   * Deterministic: gaps are exact floored-second integers ordered by
   * (second, tie-break) — the [[timeWeightedAvg]] discipline — and the
   * three moments sum exactly in DECIMAL; σ/μ/B are fixed-order doubles
   * on the per-key row. Population σ via E[g²] − E[g]²; an all-equal
   * gap set hits σ = 0 → B = −1 exactly.
   *
   * Scale: one key shuffle + per-key sort (the sessionize shape) + one
   * partial+final moment aggregate.
   */
  def burstiness(df: DataFrame, key: String, ts: String, tieBreak: String,
                 minGaps: Int = 2): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(key).orderBy(col("__t").asc, col(tieBreak).asc)
    val gaps = df.filter(col(ts).isNotNull)
      .select(col(key), col(ts).cast("long").as("__t"), col(tieBreak))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn("__g", (col("__next") - col("__t")).cast(dec))
    val m = gaps.groupBy(key)
      .agg(count(lit(1)).as("n_gaps"), sum(col("__g")).as("__sg"),
        sum(col("__g") * col("__g")).as("__sgg"))
      .filter(col("n_gaps") >= minGaps)
    val mu = col("__sg").cast("double") / col("n_gaps").cast("double")
    // clamp the E[g²] − μ² float cancellation at 0 so near-constant
    // large gaps can't sqrt a -1e-12 into NaN
    val sigma = sqrt(greatest(
      col("__sgg").cast("double") / col("n_gaps").cast("double") - mu * mu,
      lit(0.0)))
    m.select(col(key), col("n_gaps"), round(mu, 6).as("mean_gap"),
        when(sigma + mu > 0, round((sigma - mu) / (sigma + mu), 6))
          .otherwise(lit(null).cast("double")).as("burstiness"))
      .orderBy(key)
  }

  /**
   * COHORT LTV curve — cumulative revenue per user by cohort age: users
   * grouped by first-activity day, each cohort's per-day revenue
   * accumulated over days-since-cohort and divided by cohort size. The
   * "does month-2 revenue justify the acquisition cost" curve; the
   * revenue companion of `q_retention_cohorts`' headcount view. Emits
   * (cohort, age, cohort_users, ltv_per_user 6dp), ordered; cohort
   * membership comes from ANY activity (null-value events still place
   * a user), revenue from valued events only.
   *
   * Deterministic: revenue sums as exact cents in DECIMAL; one double
   * division per (cohort, age) row.
   *
   * Scale: a per-key first-day aggregate, a (cohort, age) rollup —
   * days²-bounded output regardless of corpus size — and a per-cohort
   * cumulative window over that bounded grid.
   */
  def cohortLtv(df: DataFrame, key: String, ts: String,
                valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cohorts = df.filter(col(ts).isNotNull)
      .groupBy(col(key))
      .agg(min(date_trunc("day", col(ts))).as("cohort"))
    val sizes = cohorts.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_users"))
    val rev = df
      .filter(col(ts).isNotNull)
      .select(col(key), date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .join(cohorts, key)
      .groupBy(col("cohort"),
        datediff(col("__d"), col("cohort")).cast("long").as("age"))
      .agg(sum(col("__v").cast(dec)).as("__r"))
    val w = Window.partitionBy("cohort").orderBy(col("age").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    rev.withColumn("__cum", sum(col("__r")).over(w))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("age"), col("cohort_users"),
        round(col("__cum").cast("double") /
          col("cohort_users").cast("double") / 100.0, 6).as("ltv_per_user"))
      .orderBy("cohort", "age")
  }

  /**
   * ACTIVITY STREAKS — the classic gaps-and-islands analysis per key:
   * maximal runs of CONSECUTIVE active days, via the day-index minus
   * row-number trick (consecutive days share the difference, so the
   * difference IS the run id — no iterative chasing). Emits one row
   * per key: (key, n_active_days, longest_streak, streak_start), the
   * start being the EARLIEST day among longest runs (deterministic
   * tie). The engagement metric behind "7-day streak" product
   * features, and the daily-granularity sibling of [[sessionize]]'s
   * second-granularity gap grouping.
   *
   * Scale: events collapse to DISTINCT (key, day) first — the rest
   * runs on active-day-sized rows; one key shuffle + per-key sort (the
   * sessionize shape), then two key-sized aggregates and a key-sized
   * self-join for the tie-broken start day.
   */
  def activityStreaks(df: DataFrame, key: String, ts: String): DataFrame = {
    val days = df.filter(col(ts).isNotNull)
      .select(col(key), date_trunc("day", col(ts)).as("__d"))
      .distinct()
      .withColumn("__i",
        datediff(col("__d"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.partitionBy(key).orderBy(col("__i").asc)
    val runs = days
      .withColumn("__r", col("__i") - row_number().over(w))
      .groupBy(col(key), col("__r"))
      .agg(count(lit(1)).as("__len"), min(col("__d")).as("__start"))
    val perKey = runs.groupBy(key)
      .agg(sum(col("__len")).as("n_active_days"),
        max(col("__len")).as("longest_streak"))
    perKey.join(runs.select(col(key), col("__len"), col("__start")),
        Seq(key))
      .filter(col("__len") === col("longest_streak"))
      .groupBy(col(key), col("n_active_days"), col("longest_streak"))
      .agg(min(col("__start")).as("streak_start"))
      .orderBy(key)
  }

  /**
   * MARKOV TRANSITION matrix over per-key event sequences — "after a
   * user does a, what do they do next": counts and conditional
   * probabilities P(next = b | current = a) from consecutive event
   * pairs within each key's (floored-second, tie-break)-ordered stream.
   * The journey-analytics complement of [[funnel]]'s fixed-order
   * matching: the funnel asks "did they follow THIS path", the matrix
   * reports ALL the paths' first-order structure. Each key's last event
   * has no successor and contributes nothing. Emits (from_state,
   * to_state, n, p), p 6dp, ordered.
   *
   * Deterministic: ordering uses floored epoch seconds + the caller's
   * tie-break (the [[timeWeightedAvg]] discipline — sub-second parquet
   * precision differs across engines); counts exact, one double
   * division per matrix cell.
   *
   * Scale: one key shuffle + per-key sort (the sessionize shape), then
   * a states²-bounded aggregate; the totals join runs on matrix-sized
   * rows (broadcast).
   */
  def transitionMatrix(df: DataFrame, key: String, ts: String,
                       stateCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col(tieBreak).asc)
    val pairs = df
      .filter(col(ts).isNotNull && col(stateCol).isNotNull)
      .select(col(key), col(ts).cast("long").as("__t"), col(tieBreak),
        col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_state").agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("p"))
      .orderBy("from_state", "to_state")
  }

  /**
   * TOP-K event PATHS — the most common full journeys: each key's
   * ordered event-type sequence joined into one path string, then the
   * k most frequent paths with deterministic (count desc, path asc)
   * tie order. The clickstream "what do users actually do" report —
   * [[transitionMatrix]] aggregated to first order loses exactly what
   * this keeps.
   *
   * Ordering inside a path uses floored epoch seconds + tie-break (the
   * cross-engine contract); path strings join with `sep`, so state
   * values must not contain it.
   *
   * Scale: one per-key aggregate (collect_list is bounded by the
   * per-key event count — cap upstream with [[debounce]] or windowing
   * for hot keys), one path-count aggregate, and a k-row
   * TakeOrderedAndProject — never a global sort of the paths.
   */
  def topPaths(df: DataFrame, key: String, ts: String, stateCol: String,
               tieBreak: String, k: Int, sep: String = ">"): DataFrame = {
    require(k > 0, s"bad k=$k")
    val path = array_join(
      transform(
        array_sort(collect_list(struct(col("__t"), col(tieBreak),
          col(stateCol).as("__state")))),
        x => x.getField("__state")),
      sep)
    df.filter(col(ts).isNotNull && col(stateCol).isNotNull)
      .select(col(key), col(ts).cast("long").as("__t"), col(tieBreak),
        col(stateCol))
      .groupBy(col(key)).agg(path.as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /**
   * PEAK CONCURRENCY by sweep-line — "how many intervals were open at
   * once, and when did the maximum happen": each [start, end) interval
   * contributes +1 at start and −1 at end; the running sum over the
   * sorted distinct boundary times is the concurrency curve and its max
   * the capacity-planning number. Half-open semantics: an interval
   * ending exactly when another starts does NOT overlap it (both deltas
   * land on the same boundary before the count is read). Emits one row
   * (at_sec, peak) — the EARLIEST epoch second attaining the max.
   * Degenerate intervals (end ≤ start) are dropped.
   *
   * Deterministic: all counts are exact integers; ties on the peak
   * break to the earliest boundary.
   *
   * Scale: the corpus folds into a (boundary-second, net-delta)
   * aggregate — support-sized, not row-sized — and the running sum over
   * the boundary support rides the DISTRIBUTED cumulative-sum kernel
   * ([[graft.ops.StatsOps.distributedCumSum]]: range-buckets on the
   * boundary time, per-bucket windows, broadcast prefix offsets), so
   * even a second-granular multi-year span (tens of millions of
   * distinct boundaries) never funnels through one sort task.
   */
  def peakConcurrency(df: DataFrame, startCol: String,
                      endCol: String): DataFrame = {
    val iv = df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .filter(col("__e") > col("__s"))
    val deltas = iv
      .select(explode(array(
        struct(col("__s").as("__t"), lit(1L).as("__d")),
        struct(col("__e").as("__t"), lit(-1L).as("__d")))).as("__x"))
      .select(col("__x.__t").as("__t"), col("__x.__d").as("__d"))
      .groupBy(col("__t")).agg(sum(col("__d")).as("__delta"))
    // boundary probe over the RAW interval starts (one narrow scan —
    // ends are starts shifted, same distribution for balance purposes),
    // so the boundary aggregate isn't re-evaluated just to sketch it
    graft.ops.StatsOps.distributedCumSum(deltas, "__t", col("__delta"),
        "__c", includeCurrent = true,
        probe = Some(iv.select(col("__s").as("__t"))))
      .orderBy(col("__c").desc, col("__t").asc)
      .limit(1)
      .select(col("__t").as("at_sec"), col("__c").as("peak"))
  }

  /**
   * EWMA control baseline over the daily series — per day, the
   * exponentially-weighted moving average of the daily totals and the
   * one-step-ahead residual (today's actual minus YESTERDAY's EWMA):
   * the classic EWMA control chart, where a residual spike is the
   * alarm. Day 1 seeds the average (residual NULL — no forecast
   * existed). Emits (day, actual, ewma, resid), dollars 6dp, ordered.
   *
   * Determinism: the recursion is unrolled into the explicit weight
   * form ewmaᵢ = Σⱼ wᵢⱼ·vⱼ (wᵢⱼ = α(1−α)^(i−j), seed weight
   * (1−α)^(i−1)); each weighted term rounds to 6dp into a DECIMAL sum,
   * so the float pow() never feeds an order-dependent double add (the
   * q_decayed_activity discipline).
   *
   * Scale: the corpus pre-aggregates to one exact-cents row per day;
   * the unrolled form is a days×days triangular grid — quadratic in
   * DAYS, not data, and days are bounded by the caller's window (a year
   * is 366 rows → 67k grid cells). The grid join shuffles day-count
   * rows only.
   */
  def ewmaBaseline(df: DataFrame, ts: String, valueCol: String,
                   alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"bad alpha=$alpha")
    val dec = DecimalType(28, 6)
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d")).agg(sum(col("__v")).as("__s"))
    // unpartitioned window BOUND: day-grid rows (one per calendar day)
    val idx = daily.withColumn("__i",
      row_number().over(Window.orderBy(col("__d").asc)).cast("long"))
    val j = idx.select(col("__i").as("__j"), col("__s").as("__vj"))
    val terms = idx.join(j, col("__j") <= col("__i"))
      .withColumn("__w",
        when(col("__j") === 1, pow(lit(1.0 - alpha), col("__i") - 1))
          .otherwise(lit(alpha) *
            pow(lit(1.0 - alpha), col("__i") - col("__j"))))
      .withColumn("__t",
        round(col("__w") * col("__vj").cast("double") / 100.0, 6).cast(dec))
    val ew = terms.groupBy(col("__d"), col("__i"), col("__s"))
      .agg(sum(col("__t")).as("__e"))
    // unpartitioned window BOUND: day-grid rows
    ew.withColumn("__prev",
        lag(col("__e"), 1).over(Window.orderBy(col("__i").asc)))
      .select(col("__d").as("day"),
        round(col("__s").cast("double") / 100.0, 6).as("actual"),
        round(col("__e").cast("double"), 6).as("ewma"),
        round(col("__s").cast("double") / 100.0 -
          col("__prev").cast("double"), 6).as("resid"))
      .orderBy("day")
  }

  /**
   * THEIL–SEN robust slope of the daily series — the median of all
   * pairwise day-to-day slopes: the trend estimate one corrupted day
   * cannot drag (up to ~29% outliers tolerated), the robust companion
   * of [[graft.ops.StatsOps.olsTrend]]'s least-squares fit. Emits one
   * row (n_days, n_pairs, slope) — slope in value units per day, 8dp;
   * a single-day series emits no row (no pair to slope).
   *
   * Determinism: day indices and daily cents are exact; each pairwise
   * slope is one double division computed identically everywhere, and
   * the interpolated median of that multiset is order-independent.
   *
   * Scale: quadratic in DAYS, not data (the [[ewmaBaseline]] bound) —
   * the corpus pre-aggregates to one row per day and the pair join is
   * a triangular day×day grid.
   */
  def theilSenSlope(df: DataFrame, ts: String,
                    valueCol: String): DataFrame = {
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d")).agg(sum(col("__v")).as("__s"))
    val mn = daily.agg(min(col("__d")).as("__d0"))
    val idx = daily.crossJoin(broadcast(mn))
      .select(datediff(col("__d"), col("__d0")).cast("long").as("__i"),
        col("__s"))
    val b = idx.select(col("__i").as("__j"), col("__s").as("__sj"))
    val slopes = idx.join(b, col("__j") > col("__i"))
      .select(((col("__sj") - col("__s")).cast("double") /
        (col("__j") - col("__i")).cast("double")).as("__slope"))
    slopes.agg(count(lit(1)).as("n_pairs"),
        expr("percentile(__slope, 0.5)").as("__med"))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("n_days"))))
      .filter(col("n_pairs") > 0)
      .select(col("n_days"), col("n_pairs"),
        round(col("__med") / 100.0, 8).as("slope"))
  }

  /**
   * SIEGEL REPEATED-MEDIANS SLOPE — [[theilSenSlope]]'s
   * higher-breakdown sibling: for each day i the MEDIAN of its
   * pairwise slopes to every other day, then the median of those
   * per-day medians. Theil–Sen's single global median breaks down at
   * 29% contamination (corrupt days contribute O(n) of the O(n²)
   * pairs); the repeated-medians form survives 50% — the slope to
   * reach for when whole SPANS of days are bad (an outage week, a
   * backfill gap), not just scattered outliers.
   *
   * Emits one row (n_days, slope): slope in value units per day
   * (8dp); fewer than 2 days emits no row.
   *
   * Deterministic: day totals are exact integer cents, each pairwise
   * slope is one double division of exact values, and both median
   * layers are exact interpolated percentiles (sort-based —
   * partition-order invariant).
   *
   * Scale: the theilSenSlope economics — quadratic in DAYS, never in
   * data (the day×day join is a bounded-grid self-join, whitelisted);
   * the per-day median layer adds one day-keyed aggregate over the
   * same pair frame.
   */
  def siegelSlope(df: DataFrame, ts: String, valueCol: String): DataFrame = {
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d")).agg(sum(col("__v")).as("__s"))
    val mn = daily.agg(min(col("__d")).as("__d0"))
    val idx = daily.crossJoin(broadcast(mn))
      .select(datediff(col("__d"), col("__d0")).cast("long").as("__i"),
        col("__s"))
    val b = idx.select(col("__i").as("__j"), col("__s").as("__sj"))
    val perDay = idx.join(b, col("__j") =!= col("__i"))
      .select(col("__i"), ((col("__sj") - col("__s")).cast("double") /
        (col("__j") - col("__i")).cast("double")).as("__slope"))
      .groupBy("__i")
      .agg(expr("percentile(__slope, 0.5)").as("__ms"))
    perDay.agg(count(lit(1)).as("n_days"),
        expr("percentile(__ms, 0.5)").as("__med"))
      .filter(col("n_days") >= 2)
      .select(col("n_days"), round(col("__med") / 100.0, 8).as("slope"))
  }

  def cusumChangePoint(df: DataFrame, ts: String,
                       valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d")).agg(sum(col("__v").cast(dec)).as("__s"))
    val tot = daily.agg(sum(col("__s")).as("__t"),
      count(lit(1)).as("__n"))
    // unpartitioned window BOUND: day-grid rows (one exact-cents row per day)
    val w = Window.orderBy(col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("__dev", col("__s") * col("__n") - col("__t"))
      .withColumn("__cusum", sum(col("__dev")).over(w))
      .orderBy(abs(col("__cusum")).desc, col("__d").asc)
      .limit(1)
      .select(col("__d").as("at_day"), col("__n").as("n_days"),
        round(abs(col("__cusum")).cast("double") /
          (col("__n").cast("double") * col("__n").cast("double")) / 100.0, 6)
          .as("cusum_peak"),
        when(col("__cusum") < 0, lit("up")).otherwise(lit("down"))
          .as("direction"))
  }

  /**
   * MEAN-SHIFT CHANGEPOINT — the single split of the daily series that
   * most reduces total squared error: where [[cusumChangePoint]] asks
   * "where does the integrated drift peak", this is the likelihood
   * answer — "if the level changed ONCE, when, and from what mean to
   * what mean" (binary-segmentation's first cut; recurse on the halves
   * for more breaks). Gain for a split at day d uses the
   * cancellation-free identity S_t²/t + (S−S_t)²/(n−t) − S²/n =
   * (n·S_t − t·S)² / (t·(n−t)·n) — numerator and denominator are EXACT
   * decimals off cumulative integer-cent sums, so no ~n²-magnitude
   * float subtraction ever happens. Emits one row (split_day, n_left,
   * n_right, mean_left, mean_right, gain): means 6dp value units, gain
   * 6dp value units² per... (total SSE reduction / 10⁴); ties pick the
   * earliest day; a single-day series emits no row.
   *
   * Scale: one day-grain partial aggregate, a cumulative window over
   * the bounded day grid, a 1-row total broadcast, and a top-1 on the
   * grid — the cusum shape exactly; the event rows never re-shuffle.
   */
  def changepointMean(df: DataFrame, ts: String,
                      valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__nd"), sum(col("__v").cast(dec)).as("__sd"))
    val tot = daily.agg(sum(col("__nd")).as("__n"), sum(col("__sd")).as("__s"))
    // unpartitioned window BOUND: day-grid rows (one exact-cents row per day)
    val w = Window.orderBy(col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = daily
      .withColumn("__t", sum(col("__nd")).over(w))
      .withColumn("__st", sum(col("__sd")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("__t") < col("__n"))
    val nD = col("__n").cast(dec)
    val tD = col("__t").cast(dec)
    val gainNum = nD * col("__st") - tD * col("__s")
    val gainDen = tD * (nD - tD) * nD
    cum
      .withColumn("__gain",
        (gainNum * gainNum).cast("double") / gainDen.cast("double"))
      .orderBy(col("__gain").desc, col("__d").asc)
      .limit(1)
      .select(col("__d").as("split_day"),
        col("__t").as("n_left"), (col("__n") - col("__t")).as("n_right"),
        round(col("__st").cast("double") / col("__t") / 100.0, 6)
          .as("mean_left"),
        round((col("__s") - col("__st")).cast("double") /
          (col("__n") - col("__t")) / 100.0, 6).as("mean_right"),
        round(col("__gain") / 1e4, 6).as("gain"))
  }

  /**
   * DURBIN–WATSON statistic — "after fitting the daily linear trend,
   * are the residuals still serially correlated": DW = Σ(e_t −
   * e_{t−1})²/Σe_t² over the detrended day series, ≈ 2(1 − ρ₁). The
   * regression DIAGNOSTIC beside [[acf]]'s raw autocorrelations — a
   * trend line with DW ≪ 2 is under-modeling (the errors still carry
   * structure, so its confidence intervals lie). The trend fits in
   * closed form from exact moments over the contiguous day grid (gap
   * days as true zeros, the [[acf]] convention). Emits one row
   * (n_days, slope 6dp in value units/day, dw 6dp, rho1 6dp = 1 −
   * DW/2); a flat series (zero residual mass) emits NULL dw/rho1.
   *
   * Deterministic: OLS moments are exact integers; per-day residuals
   * quantize to exact integer cents (sub-cent residual precision is
   * noise at any real magnitude) so the two quadratic sums are exact
   * decimals under any partitioning.
   *
   * Scale: one day-grain aggregate + grid windows + a grid reduce —
   * the cusum shape; events never re-shuffle.
   */
  def durbinWatson(df: DataFrame, ts: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df.filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("day"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("day").agg(sum(col("__v").cast(dec)).as("__s"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val idxd = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("__s"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(idxd, Seq("idx"), "left")
      .select(col("idx"), coalesce(col("__s"), lit(0).cast(dec)).as("y"))
    val m = series.agg(count(lit(1)).as("n"),
      sum(col("idx").cast(dec)).as("st"), sum(col("y")).as("sy"),
      sum(col("idx").cast(dec) * col("idx").cast(dec)).as("stt"),
      sum(col("idx").cast(dec) * col("y")).as("sty"))
    val nD = col("n").cast(dec)
    val den = nD * col("stt") - col("st") * col("st")
    val slope = (nD * col("sty") - col("st") * col("sy")).cast("double") /
      den.cast("double") // cents per day
    val icept = (col("sy").cast("double") -
      slope * col("st").cast("double")) / col("n").cast("double")
    val fitted = series.crossJoin(broadcast(
      m.select(col("n"),
        when(den > 0, slope).otherwise(lit(0.0)).as("__b"),
        when(den > 0, icept)
          .otherwise(col("sy").cast("double") / col("n")).as("__a"))))
      .select(col("idx"), col("n"),
        // residual quantized to exact integer cents
        round(col("y").cast("double") -
          (col("__a") + col("__b") * col("idx")), 0).cast("long").as("__e"))
    // unpartitioned window BOUND: contiguous day-grid rows
    val wLag = Window.orderBy(col("idx").asc)
    val r = fitted
      .withColumn("__ep", lag(col("__e"), 1).over(wLag))
      .agg(max(col("n")).as("n_days"),
        sum(col("__e").cast(dec) * col("__e").cast(dec)).as("__see"),
        sum(when(col("__ep").isNotNull,
          (col("__e") - col("__ep")).cast(dec) *
            (col("__e") - col("__ep")).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__sd"))
    val dw = col("__sd").cast("double") / col("__see").cast("double")
    r.crossJoin(broadcast(m.select(
        when(den > 0, round(slope / 100.0, 6))
          .otherwise(lit(null).cast("double")).as("slope"))))
      .select(col("n_days"), col("slope"),
        when(col("__see") > 0, round(dw, 6))
          .otherwise(lit(null).cast("double")).as("dw"),
        when(col("__see") > 0, round(lit(1.0) - dw / 2.0, 6))
          .otherwise(lit(null).cast("double")).as("rho1"))
  }

  /**
   * MANN–KENDALL trend test — "is the daily series monotonically
   * drifting, and is the drift significant": S = Σ_{i<j} sgn(y_j −
   * y_i) over the day series with the tie-corrected normal
   * approximation — the SIGNIFICANCE companion to [[theilSenSlope]]'s
   * robust slope (Sen tells you how steep, MK whether to believe it;
   * they are the standard pair). Emits one row (n_days, s_stat, z,
   * direction ∈ increasing | decreasing | none) — z uses the
   * continuity correction (S∓1)/√Var, 6dp; series shorter than 2 days
   * emit no row, zero variance emits NULL z.
   *
   * Deterministic: daily totals are exact cents; S and the tie mass
   * Σt(t−1)(2t+5) are exact integers; z is one double chain.
   *
   * Scale: one day-grain aggregate + a day×day triangular self-join —
   * quadratic in DAYS (the [[theilSenSlope]] shape), never in data;
   * the events shuffle once into the daily aggregate. DAY-GRAIN
   * CONTRACT: do not call at sub-day/unbounded grain — days² is fine
   * for years of daily points but not for per-second series; a
   * finer-grain caller should pre-bin to days (or port S to the
   * doubled-rank prefix identity S = Σ sgn-pairs = concordant −
   * discordant over the ranked support, the linear [[pettittTest]]
   * formulation) before exposing this at scale.
   */
  def mannKendall(df: DataFrame, ts: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d")).agg(sum(col("__v").cast(dec)).as("__s"))
    val pairs = daily.select(col("__d").as("__da"), col("__s").as("__sa"))
      .join(daily.select(col("__d").as("__db"), col("__s").as("__sb")),
        col("__da") < col("__db"))
      .agg(sum(signum((col("__sb") - col("__sa")).cast("double"))
        .cast("long")).as("s_stat"))
    val ties = daily.groupBy("__s").agg(count(lit(1)).as("__t"))
      .agg(count(lit(1)).as("__groups"), sum(col("__t")).as("__n"),
        sum(col("__t").cast(dec) * (col("__t") - 1).cast(dec) *
          (col("__t") * 2 + 5).cast(dec)).as("__tiemass"))
    val out = pairs.crossJoin(broadcast(ties))
    val nD = col("__n").cast(dec)
    val varS = (nD * (col("__n") - 1).cast(dec) *
      (col("__n") * 2 + 5).cast(dec) - col("__tiemass")).cast("double") / 18.0
    val sD = col("s_stat").cast("double")
    val zRaw = when(col("s_stat") > 0, (sD - 1.0) / sqrt(varS))
      .when(col("s_stat") < 0, (sD + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    out.filter(col("__n") > 1)
      .select(col("__n").as("n_days"), col("s_stat"),
        when(varS > 0, round(zRaw, 6))
          .otherwise(lit(null).cast("double")).as("z"),
        when(col("s_stat") > 0, "increasing")
          .when(col("s_stat") < 0, "decreasing")
          .otherwise("none").as("direction"))
  }

  /**
   * PETTITT TEST — the nonparametric changepoint: where
   * [[changepointMean]] fits the best mean-shift by squared error
   * (outlier-draggable, scale-dependent), Pettitt asks the rank
   * question — "is there a day such that before-values systematically
   * exceed after-values" — via the Mann–Whitney-style statistic
   * U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j) maximized over split points.
   * With doubled mid-ranks the double sum collapses to the exact
   * integer identity U_t = Σ_{i≤t} r2_i − t(n+1) (r2 = 2·avgRank), so
   * no pair enumeration and no floats until the final p. Emits one row
   * (split_day, n_days, k_stat, p_approx): K = max|U_t| over t < n
   * (earliest day on ties), p ≈ 2·exp(−6K²/(n³+n²)) (the standard
   * asymptotic, capped at 1). Series shorter than 2 days emit no row.
   *
   * Deterministic: daily means are single divisions of exact
   * cent-sums (IEEE-identical); doubled ranks over the day-bounded
   * mean support are exact integers; U_t is pure integer arithmetic.
   *
   * Scale: one day-grain aggregate, then rank + cumulative windows on
   * the BOUNDED day grid — the cusum shape; the event rows never
   * re-shuffle and nothing is quadratic in days, let alone data.
   */
  def pettittTest(df: DataFrame, ts: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df
      .filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__d"))
      .agg((sum(col("__v").cast(dec)).cast("double") / count(lit(1)))
        .as("__m"))
    // doubled mid-ranks of the day means over the day-bounded support
    val hist = daily.groupBy("__m").agg(count(lit(1)).as("__t"))
    // unpartitioned window BOUND: day-grid rows (≤1 per distinct mean)
    val wRank = Window.orderBy(col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = hist.withColumn("__r2",
      coalesce(sum(col("__t")).over(wRank), lit(0L)) * 2 + col("__t") + 1)
    val tot = daily.agg(count(lit(1)).as("__n"))
    // unpartitioned window BOUND: day-grid rows (time order)
    val wTime = Window.orderBy(col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val u = daily.join(ranks.select(col("__m"), col("__r2")), "__m")
      .withColumn("__i", count(lit(1)).over(wTime))
      .withColumn("__dsum", sum(col("__r2")).over(wTime))
      .crossJoin(broadcast(tot))
      .filter(col("__i") < col("__n"))
      .withColumn("__u", col("__dsum") - col("__i") * (col("__n") + 1))
    val nD = col("__n").cast("double")
    u.orderBy(abs(col("__u")).desc, col("__d").asc)
      .limit(1)
      .select(col("__d").as("split_day"), col("__n").as("n_days"),
        abs(col("__u")).as("k_stat"),
        round(least(lit(1.0), lit(2.0) * exp(lit(-6.0) *
          abs(col("__u")).cast("double") * abs(col("__u")).cast("double") /
          (nD * nD * nD + nD * nD))), 6).as("p_approx"))
  }

  /**
   * SPRT sequential monitor — Wald's sequential probability ratio test
   * over a daily Bernoulli stream: per day, the CUMULATIVE
   * log-likelihood ratio of H1 (rate = p1) against H0 (rate = p0) and
   * the decision it implies at the (α, β) error bounds. The
   * always-valid experiment/SLA monitor: where a fixed-horizon test
   * peeks illegally, SPRT's thresholds ln((1−β)/α) / ln(β/(1−α)) keep
   * both error rates honest under CONTINUOUS monitoring, and the test
   * stops on average far earlier ("the release is bad — stop the
   * rollout on day 3, not day 30").
   *
   * Emits one row per day: (day, n, k cumulative trials/successes, llr
   * 6dp, decision ∈ accept_h1 | accept_h0 | continue). The llr is
   * k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) on exact cumulative integer
   * counts — the two ln factors are constants, so the chain is
   * cross-engine deterministic.
   *
   * Scale: one day-grain aggregate (partial-aggregating, day-count-
   * sized output), then a cumulative window over the day series —
   * never a shuffle of the underlying trials.
   */
  def sprtMonitor(df: DataFrame, ts: String, successCol: String,
                  p0: Double, p1: Double, alpha: Double = 0.05,
                  beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"bad rates p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"bad errors alpha=$alpha beta=$beta")
    val daily = df.filter(col(ts).isNotNull)
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("__k"))
    // unpartitioned window BOUND: day-grid rows
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c1 = math.log(p1 / p0)
    val c0 = math.log((1.0 - p1) / (1.0 - p0))
    val upper = math.log((1.0 - beta) / alpha)
    val lower = math.log(beta / (1.0 - alpha))
    daily
      .select(col("day"), sum(col("__n")).over(w).as("n"),
        sum(col("__k")).over(w).as("k"))
      .select(col("day"), col("n"), col("k"),
        round(col("k").cast("double") * lit(c1) +
          (col("n") - col("k")).cast("double") * lit(c0), 6).as("llr"))
      .withColumn("decision",
        when(col("llr") >= lit(upper), lit("accept_h1"))
          .when(col("llr") <= lit(lower), lit("accept_h0"))
          .otherwise(lit("continue")))
  }

  /**
   * AUTOCORRELATION function of the daily count series — r_k for lags
   * 1..`maxLag`: the periodicity DIAGNOSTIC beside [[maseReport]]'s
   * verdict and the seasonality-strength η² — a weekly cycle shows as
   * the lag-7 spike, a trend as slow decay, white noise as ≈0
   * everywhere. Gap days count as ZERO (they are real observations of
   * "nothing happened"); the series is the contiguous [min day, max
   * day] grid, so lags never misalign across gaps.
   *
   * Emits (lag, n_pairs, acf 6dp), the standard biased estimator
   * r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)² with the GLOBAL mean — via
   * the products identity: every per-lag aggregate (Σy_t·y_{t+k},
   * Σy_t, Σy_{t+k}, pair count) is an exact integer, and only the
   * final combination numerator_k = sab − m·(sa+sb) + c·m² (m = S/n)
   * runs in doubles, one pinned chain per lag — so both engines agree
   * bit-for-bit without decimal-routing any (y−ȳ) float.
   *
   * Scale: one day-grain aggregate (partial-aggregating), a day-grid
   * explode, and ONE equi-join of the (grid × maxLag)-row exploded
   * frame back to the grid on the shifted index — day-count-sized
   * everything, events never shuffle; the totals ride a 1-row
   * broadcast.
   */
  def acf(df: DataFrame, ts: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"bad maxLag $maxLag")
    val daily = df.filter(col(ts).isNotNull)
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(count(lit(1)).as("y"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dailyIdx = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("y"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(dailyIdx, Seq("idx"), "left")
      // DECIMAL(38,0), the welchCore discipline: the oracle runs these
      // products/sums in HUGEINT, and a BIGINT Σy·y would silently wrap
      // (non-ANSI Spark) once a daily count passes ~3e9 — decimal either
      // holds exactly or surfaces as NULL on both engines, never wraps
      .select(col("idx"),
        coalesce(col("y"), lit(0L)).cast("decimal(38,0)").as("y"))
    val totals = series.agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
      sum(col("y") * col("y")).as("syy"))
    val pairs = series
      .select(col("idx"), col("y").as("ya"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .select(col("lag"), (col("idx") + col("lag")).as("idxb"), col("ya"))
      .join(series.select(col("idx").as("idxb"), col("y").as("yb")), "idxb")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("ya")).as("sa"),
        sum(col("yb")).as("sb"), sum(col("ya") * col("yb")).as("sab"))
    val m = col("s").cast("double") / col("n").cast("double")
    val denom = col("syy").cast("double") - m * col("s").cast("double")
    pairs.crossJoin(broadcast(totals))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        when(denom > 0.0,
          round((col("sab").cast("double") -
            m * (col("sa") + col("sb")).cast("double") +
            col("n_pairs").cast("double") * m * m) / denom, 6))
          .otherwise(lit(null).cast("double")).as("acf"))
      .orderBy("lag")
  }

  /** Contiguous day-grid of daily EVENT COUNTS with the grid length and
    * count total — the shared series construction behind [[acf]],
    * [[ljungBox]], [[kpssTest]] and [[dominantCycle]]: gap days enter
    * as true zeros (a day with no rows IS an observation of a daily
    * count), values ride DECIMAL(38,0) (the welchCore discipline — a
    * BIGINT Σy·y would silently wrap under non-ANSI Spark). */
  private def dailyCountSeries(df: DataFrame, ts: String)
      : (DataFrame, DataFrame) = {
    val daily = df.filter(col(ts).isNotNull)
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(count(lit(1)).as("y"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dailyIdx = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("y"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(dailyIdx, Seq("idx"), "left")
      .select(col("idx"),
        coalesce(col("y"), lit(0L)).cast("decimal(38,0)").as("y"))
    val totals = series.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    (series, totals)
  }

  /**
   * LJUNG–BOX portmanteau test — "is the daily series white noise":
   * Q = n(n+2)·Σ_{k=1..h} ρ_k²/(n−k) over the first h sample
   * autocorrelations. Where [[acf]] hands back the per-lag picture,
   * Ljung–Box collapses it into ONE is-there-any-structure number —
   * the residual-diagnostics gate after a seasonal fit, and the
   * pre-check before anyone trusts an i.i.d.-assuming monitor on the
   * series. Rides [[acf]]'s exact-moment machinery (gap days = true
   * zeros on the contiguous grid). Emits one row (n_days, h, q_stat),
   * 6dp; a zero-variance series (all ρ undefined) emits NULL q_stat.
   *
   * Deterministic: each ρ is acf's 6dp-pinned value; the ρ²/(n−k)
   * terms round 8dp and sum through DECIMAL; one pinned double chain.
   *
   * Scale: exactly [[acf]] — one day-grain aggregate + an h-fanout
   * equi self-join on the bounded day grid + a one-row reduce.
   */
  def ljungBox(df: DataFrame, ts: String, maxLag: Int): DataFrame = {
    val dterm = DecimalType(24, 8)
    val a = acf(df, ts, maxLag)
    // contiguous grid ⇒ n = lag + n_pairs on every row
    val terms = a.select(
      (col("lag") + col("n_pairs")).cast("long").as("__n"),
      col("acf"),
      round(col("acf") * col("acf") / col("n_pairs").cast("double"), 8)
        .cast(dterm).as("__t"))
    terms.groupBy("__n")
      .agg(count(lit(1)).as("h"), count(col("acf")).as("__ok"),
        sum(col("__t")).as("__s"))
      .select(col("__n").as("n_days"), col("h"),
        when(col("__ok") === col("h"),
          round(col("__n").cast("double") * (col("__n") + 2).cast("double")
            * col("__s").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("q_stat"))
  }

  /**
   * KPSS level-stationarity test — "does the daily series mean-revert
   * or drift": η = (Σ_t S_t²/n²) / σ̂²_lr with S_t the partial sums of
   * the demeaned series and σ̂²_lr the Bartlett-weighted long-run
   * variance at the given bandwidth. The STATIONARITY companion to
   * [[mannKendall]] (MK asks "is there a monotone trend"; KPSS asks
   * "is the LEVEL stable at all" — a unit-root random walk passes MK
   * and fails KPSS). Null = stationary: η above the 5% critical value
   * 0.463 rejects. Emits one row (n_days, bandwidth, eta,
   * level_stationary), η 6dp, verdict at the 5% point; zero long-run
   * variance emits NULL η.
   *
   * Deterministic: everything scales by n so the demeaned series
   * E_t = n·y_t − Σy is an EXACT integer; partial sums, ΣE², and the
   * lagged ΣE_tE_{t−j} all run in DECIMAL(38,0); η is one pinned
   * double chain on the final row (η = n·ΣS'² / (n²·(ΣE² + 2Σw_jΣEE_j))
   * after the n-power bookkeeping).
   *
   * Scale: the [[acf]] shape — one day-grain aggregate, a bandwidth-
   * fanout equi self-join and one cumulative window on the bounded day
   * grid, 1-row reduces.
   */
  def kpssTest(df: DataFrame, ts: String, bandwidth: Int): DataFrame = {
    require(bandwidth >= 0 && bandwidth <= 366, s"bad bandwidth $bandwidth")
    val dec = DecimalType(38, 0)
    val (series, totals) = dailyCountSeries(df, ts)
    // E_t = n·y_t − s: the ×n-scaled demeaned series, exact integer
    val e = series.crossJoin(broadcast(totals))
      .select(col("idx"), col("n"),
        (col("n").cast(dec) * col("y") - col("s")).as("__e"))
    // unpartitioned window BOUND: contiguous day-grid rows
    val wCum = Window.orderBy(col("idx").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val sums = e
      .withColumn("__sp", sum(col("__e")).over(wCum))
      .agg(max(col("n")).as("n"),
        sum(col("__e") * col("__e")).as("__se2"),
        sum(col("__sp") * col("__sp")).as("__ss2"))
    // Bartlett-weighted lagged cross-terms g_j = Σ_t E_t·E_{t−j}
    val lagged =
      if (bandwidth == 0) null
      else e.select(col("idx"), col("__e").as("__ea"),
          explode(sequence(lit(1), lit(bandwidth))).as("lag"))
        .select(col("lag"), (col("idx") + col("lag")).as("idxb"),
          col("__ea"))
        .join(e.select(col("idx").as("idxb"), col("__e").as("__eb")),
          "idxb")
        .groupBy("lag").agg(sum(col("__ea") * col("__eb")).as("__g"))
        .select(round((lit(1.0) - col("lag").cast("double") /
          (bandwidth + 1.0)) * col("__g").cast("double"), 4)
          .cast(DecimalType(38, 4)).as("__wg"))
        .agg(coalesce(sum(col("__wg")), lit(0).cast(DecimalType(38, 4)))
          .as("__swg"))
    val withLr =
      if (bandwidth == 0)
        sums.withColumn("__swg", lit(0).cast(DecimalType(38, 4)))
      else sums.crossJoin(broadcast(lagged))
    val nD = col("n").cast("double")
    // σ²_lr·n³ = ΣE² + 2Σw_j·g_j;  Σ S_t²/n² = ΣS'²/n⁴
    // η = ΣS'² / (n · (ΣE² + 2Σw_j·g_j))
    val lr = col("__se2").cast("double") +
      col("__swg").cast("double") * 2.0
    val eta = col("__ss2").cast("double") / (nD * lr)
    withLr.filter(col("n") > 1)
      .select(col("n").as("n_days"), lit(bandwidth.toLong).as("bandwidth"),
        when(lr > 0, round(eta, 6))
          .otherwise(lit(null).cast("double")).as("eta"),
        when(lr > 0, round(eta, 6) <= 0.463)
          .otherwise(lit(null).cast("boolean")).as("level_stationary"))
  }

  /**
   * DOMINANT-CYCLE PERIODOGRAM — the share of the daily series'
   * variance carried by each candidate period p: the discrete-Fourier
   * power 2·(a_p² + b_p²)/(n·ΣE²) of the demeaned series at frequency
   * 1/p, for p = 2..maxPeriod days. Where [[seasonalDecompose]]
   * ASSUMES the weekly cycle and measures it, the periodogram FINDS
   * the cycle — "is this metric weekly, biweekly, or monthly" before
   * anyone hard-codes a 7. Emits one row per period: (period, power
   * 6dp, is_dominant), ordered; power ≈ 1 means the series is a pure
   * sinusoid at that period.
   *
   * Deterministic: the demeaned series is the exact integer
   * E_t = n·y_t − Σy; cos/sin arguments reduce mod p IN INTEGER first
   * (2π·(t mod p)/p stays in [0, 2π) — large-argument libm reduction
   * is where engines could diverge); each E·cos term rounds to 4dp
   * and sums through DECIMAL; one pinned double chain per period.
   *
   * Scale: one day-grain aggregate + a (maxPeriod−1)-fanout explode
   * over the bounded day grid + a per-period reduce + a 1-row max
   * broadcast — never corpus-scaled.
   */
  def dominantCycle(df: DataFrame, ts: String, maxPeriod: Int): DataFrame = {
    require(maxPeriod >= 2 && maxPeriod <= 366, s"bad maxPeriod $maxPeriod")
    val dsum = DecimalType(38, 4)
    val (series, totals) = dailyCountSeries(df, ts)
    val e = series.crossJoin(broadcast(totals))
      .select(col("idx"), col("n"),
        (col("n").cast(DecimalType(38, 0)) * col("y") - col("s")).as("__e"))
    val twoPi = lit(2.0 * math.Pi)
    val arg = twoPi * pmod(col("idx"), col("period")).cast("double") /
      col("period").cast("double")
    val byP = e
      .select(col("idx"), col("n"), col("__e"),
        explode(sequence(lit(2), lit(maxPeriod))).as("period"))
      .select(col("period"), col("n"),
        round(col("__e").cast("double") * cos(arg), 4).cast(dsum).as("__a"),
        round(col("__e").cast("double") * sin(arg), 4).cast(dsum).as("__b"),
        (col("__e") * col("__e")).as("__e2"))
      .groupBy("period")
      .agg(max(col("n")).as("n"), sum(col("__a")).as("__sa"),
        sum(col("__b")).as("__sb"), sum(col("__e2")).as("__se2"))
    val powered = byP.select(col("period").cast("long").as("period"),
      when(col("__se2").cast("double") > 0,
        round((col("__sa").cast("double") * col("__sa").cast("double") +
          col("__sb").cast("double") * col("__sb").cast("double")) * 2.0 /
          (col("n").cast("double") * col("__se2").cast("double")), 6))
        .otherwise(lit(null).cast("double")).as("power"))
    val top = powered.agg(max(col("power")).as("__mx"))
    powered.crossJoin(broadcast(top))
      .select(col("period"), col("power"),
        (col("power").isNotNull && col("power") === col("__mx"))
          .as("is_dominant"))
      .orderBy("period")
  }

  /**
   * SPECTRAL ENTROPY of the daily series — how CONCENTRATED is the
   * series' rhythm: the Shannon entropy of the normalized
   * [[dominantCycle]] periodogram, scaled to [0, 1] by ln(periods).
   * Near 0 = one period owns the variance (a metronome — schedule it);
   * near 1 = white-noise spectrum (no cycle to exploit). The
   * one-number summary of the periodogram the dominant-period argmax
   * can't give ("period 7 wins" hides whether it won by 90% or 9%).
   * Emits one row (n_periods, spectral_entropy, concentration =
   * 1 − entropy), 6dp; a degenerate spectrum (≤1 positive-power
   * period) emits entropy 0 / concentration 1.
   *
   * Deterministic: rides dominantCycle's 6dp-pinned powers; the
   * renormalized −p·ln(p) terms round 8dp and sum through DECIMAL.
   *
   * Scale: exactly [[dominantCycle]] + a periods-row reduce.
   */
  def spectralEntropy(df: DataFrame, ts: String,
                      maxPeriod: Int): DataFrame = {
    val dterm = DecimalType(24, 8)
    // the ≤(maxPeriod−1)-row periodogram is referenced twice (the
    // normalizer and the term pass) — localCheckpoint pins it so the
    // whole day-grid fanout chain runs once, not per reference
    val pw = dominantCycle(df, ts, maxPeriod)
      .filter(col("power").isNotNull && col("power") > 0)
      .localCheckpoint()
    // the 6dp powers sum through DECIMAL (a double sum over the
    // period rows would be partition-order-sensitive in the last ulp)
    val tot = pw.agg(sum(col("power").cast(DecimalType(18, 6))).as("__tp"),
      count(lit(1)).as("n_periods"))
    val p = col("power") / col("__tp").cast("double")
    val h = pw.crossJoin(broadcast(tot))
      .select(col("n_periods"),
        round(-p * log(p), 8).cast(dterm).as("__t"))
      .groupBy("n_periods").agg(sum(col("__t")).as("__h"))
    h.select(col("n_periods"),
      when(col("n_periods") > 1,
        round(greatest(col("__h").cast("double"), lit(0.0)) /
          log(col("n_periods").cast("double")), 6))
        .otherwise(lit(0.0)).as("spectral_entropy"))
      .withColumn("concentration",
        round(lit(1.0) - col("spectral_entropy"), 6))
  }

  /**
   * TWO-PERIOD POISSON RATE TEST — "did the event rate CHANGE between
   * the first and second half of the window": with k₁ events over t₁
   * days and k₂ over t₂, under a constant rate the first-half count is
   * Binomial(k₁+k₂, t₁/(t₁+t₂)) — the conditional test whose z is
   * exact-input and nuisance-free (no rate variance to estimate). The
   * incident-rate companion to [[runsTest]] (runs sees pattern, this
   * sees LEVEL: "errors per day doubled"). The split is the midpoint
   * of the observed day range. Emits one row (k1, t1_days, k2,
   * t2_days, rate1, rate2, z), rates/z 6dp; a degenerate window
   * (single day or zero events) emits NULL z.
   *
   * Deterministic: counts and day spans are exact integers; one pinned
   * double chain.
   *
   * Scale: one 1-row bounds aggregate + one conditional-aggregation
   * pass — the reconcile shape.
   */
  def poissonRateTest(df: DataFrame, ts: String): DataFrame = {
    val daysOf = df.filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("__d"))
    val bounds = daysOf.agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"))
      .select(col("__d0"),
        datediff(col("__d1"), col("__d0")).cast("long").as("__span"))
    // integer midpoint: Spark's `/` on longs is TRUE division — keep
    // the split day and the span arithmetic in exact longs
    val mid = floor(col("__span") / 2).cast("long")
    val m = daysOf.crossJoin(broadcast(bounds))
      .select((datediff(col("__d"), col("__d0")).cast("long") <= mid)
        .as("__first"), col("__span"))
      .groupBy("__span")
      .agg(sum(when(col("__first"), 1L).otherwise(0L)).as("k1"),
        sum(when(!col("__first"), 1L).otherwise(0L)).as("k2"))
    val t1 = mid + 1
    val t2 = col("__span") + 1 - t1
    val kTot = (col("k1") + col("k2")).cast("double")
    val frac = t1.cast("double") / (col("__span") + 1).cast("double")
    val z = (col("k1").cast("double") - kTot * frac) /
      sqrt(kTot * frac * (lit(1.0) - frac))
    m.select(col("k1"), t1.as("t1_days"), col("k2"), t2.as("t2_days"),
      round(col("k1").cast("double") / t1.cast("double"), 6).as("rate1"),
      round(col("k2").cast("double") / t2.cast("double"), 6).as("rate2"),
      when(col("__span") > 0 && kTot > 0 && frac > 0 && frac < 1,
        round(z, 6)).otherwise(lit(null).cast("double")).as("z"))
  }

  /**
   * CHATTERJEE'S ξ — the MODERN dependence coefficient (Chatterjee
   * 2020) of the daily series on TIME: ξ ≈ 0 when the value is
   * independent of the date, ξ → 1 when the value is a FUNCTION of the
   * date — any function, not just monotone. The nonlinear companion to
   * [[mannKendall]] (MK only sees monotone drift; a clean seasonal
   * wave scores MK ≈ 0 but ξ high). General tie-aware form on the day
   * grid (t ordered): ξ = 1 − n·Σ|r_{t+1} − r_t| /
   * (2·Σ l_t·(n − l_t)), r_t = #{u: y_u ≤ y_t}, l_t = #{u: y_u ≥ y_t}.
   * Daily values are exact cents sums; gap days are true zeros (the
   * [[acf]] convention). Emits one row (n_days, xi), 6dp; a constant
   * series emits NULL.
   *
   * Deterministic: r/l are exact tie-inclusive counts off RANGE
   * windows; the sum of adjacent rank jumps is an exact integer; one
   * division on the final row.
   *
   * Scale: one day-grain aggregate + three windows over the bounded
   * contiguous day grid + a one-row reduce; events never re-shuffle.
   */
  def chatterjeeXi(df: DataFrame, ts: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df.filter(col(ts).isNotNull)
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(coalesce(sum(graft.ops.StatsOps.cents(col(valueCol))), lit(0L))
        .as("y"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(daily.crossJoin(broadcast(bounds))
        .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
          col("y")), Seq("idx"), "left")
      .select(col("idx"), coalesce(col("y"), lit(0L)).as("y"))
    // unpartitioned windows BOUND: contiguous day-grid rows.
    // r = tie-inclusive count of y_u <= y_t (RANGE frame over value);
    // l = tie-inclusive count of y_u >= y_t
    val wLe = Window.orderBy(col("y").asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wGe = Window.orderBy(col("y").asc)
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val wT = Window.orderBy(col("idx").asc)
    val tot = series.agg(count(lit(1)).as("n"))
    val ranked = series.crossJoin(broadcast(tot))
      .withColumn("__r", count(lit(1)).over(wLe))
      .withColumn("__l", count(lit(1)).over(wGe))
      .withColumn("__rn", lead(col("__r"), 1).over(wT))
    val m = ranked.agg(max(col("n")).as("n"),
      sum(when(col("__rn").isNotNull, abs(col("__rn") - col("__r")))
        .otherwise(lit(0L)).cast(dec)).as("__sd"),
      sum(col("__l").cast(dec) *
        (col("n") - col("__l")).cast(dec)).as("__sl"))
    m.filter(col("n") > 1)
      .select(col("n").as("n_days"),
        when(col("__sl").cast("double") > 0,
          round(lit(1.0) - col("n").cast("double") *
            col("__sd").cast("double") /
            (lit(2.0) * col("__sl").cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("xi"))
  }

  /**
   * WALD–WOLFOWITZ RUNS TEST — "do the daily values wander in STREAKS
   * or flip like a coin": count the runs of consecutive above-median /
   * below-median days and compare with the exchangeability
   * expectation. Too FEW runs = persistence/regime-clustering (a
   * level-shifted or autocorrelated series); too MANY = forced
   * alternation (load-balancer artifacts, overcorrection). The
   * order-sensitive randomness check the value histogram cannot see —
   * any permutation of the same days has the same histogram but a
   * different run count. Days equal to the median are dropped (the
   * standard convention); the median is the lower/upper-middle
   * average over the day grid. Emits one row (n_used, n_above,
   * n_below, runs, z, verdict ∈ clustered | alternating | none),
   * z 6dp with the classical moments.
   *
   * Deterministic: daily values are exact cents; the median positions,
   * sign sequence, and run count are exact integers off bounded-grid
   * windows; one pinned double chain.
   *
   * Scale: one day-grain aggregate + cumulative/lag windows over the
   * bounded contiguous day grid + a one-row reduce; events never
   * re-shuffle.
   */
  def runsTest(df: DataFrame, ts: String, valueCol: String): DataFrame = {
    val daily = df.filter(col(ts).isNotNull)
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(coalesce(sum(graft.ops.StatsOps.cents(col(valueCol))), lit(0L))
        .as("y"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(daily.crossJoin(broadcast(bounds))
        .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
          col("y")), Seq("idx"), "left")
      .select(col("idx"), coalesce(col("y"), lit(0L)).as("y"))
    // unpartitioned windows BOUND: contiguous day-grid rows
    val tot = series.agg(count(lit(1)).as("__n"))
    val ranked = series.crossJoin(broadcast(tot))
      .withColumn("__cum", count(lit(1)).over(
        Window.orderBy(col("y").asc)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
    val lo = ranked.filter(col("__cum") * 2 >= col("__n") + (col("__n") % 2))
      .agg(min(col("y")).as("__lo"))
    val hi = ranked
      .filter(col("__cum") * 2 >= col("__n") + 2 - (col("__n") % 2))
      .agg(min(col("y")).as("__hi"))
    val med = lo.crossJoin(broadcast(hi))
      .select(((col("__lo") + col("__hi")).cast("double") / 2.0).as("__med"))
    val signed = series.crossJoin(broadcast(med))
      .filter(col("y").cast("double") =!= col("__med"))
      .select(col("idx"), (col("y").cast("double") > col("__med")).as("__s"))
    val wT = Window.orderBy(col("idx").asc)
    val runs = signed
      .withColumn("__prev", lag(col("__s"), 1).over(wT))
      .agg(count(lit(1)).as("n_used"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("n_above"),
        sum(when(!col("__s"), 1L).otherwise(0L)).as("n_below"),
        (sum(when(col("__prev").isNotNull && col("__prev") =!= col("__s"),
          1L).otherwise(0L)) + 1).as("runs"))
    val n1 = col("n_above").cast("double"); val n2 = col("n_below").cast("double")
    val n = n1 + n2
    val e = n1 * n2 * 2.0 / n + 1.0
    val v = n1 * n2 * 2.0 * (n1 * n2 * 2.0 - n) / (n * n * (n - 1.0))
    val z = (col("runs").cast("double") - e) / sqrt(v)
    runs.filter(col("n_above") > 0 && col("n_below") > 0)
      .select(col("n_used"), col("n_above"), col("n_below"), col("runs"),
        when(v > 0, round(z, 6))
          .otherwise(lit(null).cast("double")).as("z"),
        when(v <= 0, "none")
          .when(z < -1.96, "clustered").when(z > 1.96, "alternating")
          .otherwise("none").as("verdict"))
  }

  /**
   * MARKOV STATIONARY DISTRIBUTION of the event-type chain — where
   * does a user's behavior SETTLE: the long-run occupancy of each
   * event type under the observed first-order transition matrix,
   * found by power iteration with per-step renormalization. The
   * equilibrium companion to `q_markov_transitions`' one-step matrix
   * and [[markovRemovalAttribution]]'s absorption view — raw event
   * FREQUENCY over-counts burst states; the stationary distribution
   * weights each state by where the DYNAMICS keep returning. Emits
   * one row per state: (state, stationary_prob), 6dp, ordered;
   * transitions into never-a-source sink states leak mass that the
   * renormalization redistributes (documented; with every observed
   * type also observed as a source — the common case — the chain is
   * closed).
   *
   * Deterministic: the [[markovRemovalAttribution]] discipline —
   * transition probabilities 9dp off exact counts, per-step products
   * 9dp into exact BigDecimal sums, renormalized ratios re-pinned to
   * 9dp per state per step; the oracle unrolls the identical chain.
   *
   * Scale: ONE corpus pass (user-partitioned lag + a (states²)-bounded
   * count aggregate); the iteration runs driver-side on the bounded
   * model artifact — never on data (the attribution precedent:
   * "(channels+3)² transition matrices" are model artifacts, not
   * corpus rows).
   */
  def markovStationary(df: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String,
                       iters: Int = 30): DataFrame = {
    require(iters >= 1 && iters <= 100, s"bad iters $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("__u").orderBy(col("__ts"), col("__tie"))
    val base = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(typeCol).as("__e"))
    val counts = base
      .withColumn("__prev", lag(col("__e"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("src"), col("__e").as("dst"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val prob: Map[(String, String), Double] = counts.map { case (s, t, n) =>
      (s, t) -> r9(n.toDouble / totals(s))
    }.toMap
    val states = totals.keySet.toSeq.sorted
    var pi: Map[String, Double] =
      states.map(_ -> r9(1.0 / states.size)).toMap
    for (_ <- 1 to iters) {
      // exact 9dp-term sums in BigDecimal (partition-order-free by
      // construction: the fold runs over the sorted state list)
      val raw: Map[String, BigDecimal] = states.map { j =>
        j -> states.foldLeft(BigDecimal(0)) { (acc, i) =>
          prob.get((i, j)) match {
            case Some(p) => acc + BigDecimal(r9(pi(i) * p))
            case None => acc
          }
        }
      }.toMap
      val tot = raw.values.sum
      pi =
        if (tot > 0)
          states.map(j => j -> r9(raw(j).toDouble / tot.toDouble)).toMap
        else pi
    }
    states.map(st => (st, r6(pi(st))))
      .toDF("state", "stationary_prob")
      .orderBy("state")
  }

  /**
   * SEASONAL DECOMPOSITION of the daily value series — the classical
   * additive split value = trend + seasonal + residual: trend is the
   * CENTERED 7-day moving average (defined only where the full window
   * exists), seasonal is the day-of-week mean of the detrended series,
   * residual is what neither explains — the table behind
   * `q_seasonality_strength`'s single η² ("Mondays run +2.3k above
   * trend" instead of "the weekly cycle explains 40%"). Gap days enter
   * as true zeros on the contiguous grid (the [[acf]] convention — a
   * day with no rows is a real observation of a daily SUM). Emits one
   * row per grid day: (day, value, trend, seasonal, residual), 6dp,
   * ordered; the first/last 3 days carry NULL trend/residual.
   *
   * Deterministic: daily sums are exact cents; trend is one division
   * of an exact 7-day decimal sum; the detrended values re-quantize to
   * exact micros before the day-of-week mean (float-add order never
   * crosses days); day-of-week is pure date arithmetic (an epoch-anchor
   * datediff mod 7 — engine-native DOW numbering conventions differ).
   *
   * Scale: one day-grain aggregate + grid windows + a 7-row seasonal
   * broadcast — the cusum shape; events never re-shuffle.
   */
  def seasonalDecompose(df: DataFrame, ts: String,
                        valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df.filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("day"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("day").agg(sum(col("__v").cast(dec)).as("__s"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val idxd = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("__s"))
    val grid = bounds
      .select(col("d0"), explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(idxd, Seq("idx"), "left")
      .select(col("idx"),
        date_add(col("d0").cast("date"), col("idx").cast("int")).as("day"),
        coalesce(col("__s"), lit(0).cast(dec)).as("__s"))
    // unpartitioned window BOUND: contiguous day-grid rows
    val w7 = Window.orderBy(col("idx").asc).rowsBetween(-3, 3)
    val value = round(col("__s").cast("double") / 100.0, 6)
    val withTrend = grid
      .withColumn("value", value)
      .withColumn("trend",
        when(count(lit(1)).over(w7) === 7,
          round(sum(col("__s")).over(w7).cast("double") / 7.0 / 100.0, 6)))
      .withColumn("__detr",
        when(col("trend").isNotNull, round(col("value") - col("trend"), 6)))
      // engine-neutral day-of-week: datediff from a Monday anchor mod 7
      .withColumn("__dow",
        pmod(datediff(col("day"), to_date(lit("2024-01-01"))), lit(7)))
    val seasonal = withTrend
      .filter(col("__detr").isNotNull)
      .select(col("__dow"),
        (col("__detr").cast(org.apache.spark.sql.types.DecimalType(18, 6))
          * 1000000).cast("long").as("__dm"))
      .groupBy("__dow")
      .agg(round(sum(col("__dm")).cast("double") / count(lit(1)) / 1e6, 6)
        .as("seasonal"))
    withTrend.join(broadcast(seasonal), Seq("__dow"), "left")
      .select(col("day"), col("value"), col("trend"), col("seasonal"),
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          round(col("value") - col("trend") - col("seasonal"), 6))
          .as("residual"))
      .orderBy("day")
  }

  /**
   * GRANGER-STYLE lag test — "does YESTERDAY'S x volume improve today's
   * y forecast beyond what yesterday's y already tells you": the
   * predictive-direction readout behind [[crossCorrelation]]'s
   * symmetric lead/lag peak. Fits y_t ~ y_{t−1} against
   * y_t ~ y_{t−1} + x_{t−1} in CLOSED FORM (the two-predictor R²
   * identity off pairwise correlations — no iterative fit), and reads
   * the F statistic of the added regressor. Daily counts on the
   * contiguous grid with gap days as true zeros (the [[acf]]
   * convention). Emits one row (n_days_used, r2_restricted, r2_full,
   * f_stat), 6dp; degenerate legs (constant series, collinear lags,
   * n ≤ 3) emit NULLs. Association, not causation — the usual Granger
   * caveat: it reads PREDICTIVE priority only.
   *
   * Deterministic: all nine moments of (y, y₁, x₁) are exact integer
   * sums in DECIMAL(38,0) from one pass over the lag-joined grid; the
   * correlations, R²s, and F are one pinned double chain.
   *
   * Scale: one day-grain conditional aggregate + a grid self-join on
   * the shifted index + a 1-row reduce — day-count-sized everything.
   */
  def grangerLite(df: DataFrame, ts: String, typeCol: String,
                  xType: String, yType: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df
      .filter(col(ts).isNotNull &&
        (col(typeCol) === xType || col(typeCol) === yType))
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(sum(when(col(typeCol) === xType, 1L).otherwise(0L)).as("__x"),
        sum(when(col(typeCol) === yType, 1L).otherwise(0L)).as("__y"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val idxd = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("__x"), col("__y"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(idxd, Seq("idx"), "left")
      .select(col("idx"), coalesce(col("__x"), lit(0L)).cast(dec).as("x"),
        coalesce(col("__y"), lit(0L)).cast(dec).as("y"))
    val lagged = series.select(col("idx"), col("y"))
      .join(series.select((col("idx") + 1).as("idx"), col("y").as("y1"),
        col("x").as("x1")), "idx")
    val m = lagged.agg(count(lit(1)).as("n"),
      sum(col("y")).as("sy"), sum(col("y1")).as("sy1"),
      sum(col("x1")).as("sx1"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("y1") * col("y1")).as("sy1y1"),
      sum(col("x1") * col("x1")).as("sx1x1"),
      sum(col("y") * col("y1")).as("syy1"),
      sum(col("y") * col("x1")).as("syx1"),
      sum(col("y1") * col("x1")).as("sy1x1"))
    val nD = col("n").cast(dec)
    def corr(spq: Column, sp: Column, sq: Column, spp: Column,
             sqq: Column): Column = {
      val num = (nD * spq - sp * sq).cast("double")
      val dp = (nD * spp - sp * sp).cast("double")
      val dq = (nD * sqq - sq * sq).cast("double")
      when(dp > 0 && dq > 0, num / sqrt(dp * dq))
        .otherwise(lit(null).cast("double"))
    }
    val ra = corr(col("syy1"), col("sy"), col("sy1"), col("syy"),
      col("sy1y1")) // corr(y, y1)
    val rb = corr(col("syx1"), col("sy"), col("sx1"), col("syy"),
      col("sx1x1")) // corr(y, x1)
    val rc = corr(col("sy1x1"), col("sy1"), col("sx1"), col("sy1y1"),
      col("sx1x1")) // corr(y1, x1)
    val r2r = ra * ra
    val r2f = (ra * ra + rb * rb - lit(2.0) * ra * rb * rc) /
      (lit(1.0) - rc * rc)
    val ok = ra.isNotNull && rb.isNotNull && rc.isNotNull &&
      (lit(1.0) - rc * rc) > 0 && col("n") > 3
    val f = greatest(lit(0.0), (r2f - r2r) * (col("n") - 3).cast("double") /
      (lit(1.0) - r2f))
    m.select(col("n").as("n_days_used"),
      when(ra.isNotNull, round(r2r, 6)).as("r2_restricted"),
      when(ok, round(r2f, 6)).as("r2_full"),
      when(ok && (lit(1.0) - r2f) > 0, round(f, 6))
        .otherwise(lit(null).cast("double")).as("f_stat"))
  }

  /**
   * CROSS-CORRELATION between two event streams' daily counts — r_k for
   * lags −`maxLag`..+`maxLag`: does stream A LEAD stream B (marketing
   * clicks today → purchases in k days shows as a positive-lag peak), or
   * lag it (negative-lag peak)? The bivariate twin of [[acf]]: same
   * contiguous day grid with real zeros, same products identity so every
   * per-lag aggregate is an exact integer and only one pinned double
   * chain runs per output row. Positive lag k correlates x_t with
   * y_{t+k} (x leads by k).
   *
   * Emits (lag, n_pairs, xcf 6dp); NULL when either series is constant
   * (zero variance — the [[acf]] degenerate convention). Normalization
   * is by the full-series standard deviations (the standard CCF
   * estimator), so |r| can stay < 1 strictly.
   *
   * Scale: identical to [[acf]] — day-grain aggregates, a day-grid
   * explode, one equi-join on the shifted index; events never shuffle.
   */
  def crossCorrelation(df: DataFrame, ts: String, typeCol: String,
                       typeA: String, typeB: String,
                       maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"bad maxLag $maxLag")
    val daily = df
      .filter(col(ts).isNotNull &&
        (col(typeCol) === typeA || col(typeCol) === typeB))
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(sum(when(col(typeCol) === typeA, 1L).otherwise(0L)).as("x"),
        sum(when(col(typeCol) === typeB, 1L).otherwise(0L)).as("y"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dailyIdx = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("x"), col("y"))
    val series = bounds
      .select(explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(dailyIdx, Seq("idx"), "left")
      // DECIMAL(38,0) for the same overflow-impossible reason as [[acf]]
      .select(col("idx"),
        coalesce(col("x"), lit(0L)).cast("decimal(38,0)").as("x"),
        coalesce(col("y"), lit(0L)).cast("decimal(38,0)").as("y"))
    val totals = series.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
    val pairs = series
      .select(col("idx"), col("x").as("xa"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"))
      .select(col("lag"), (col("idx") + col("lag")).as("idxb"), col("xa"))
      .join(series.select(col("idx").as("idxb"), col("y").as("yb")), "idxb")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("xa")).as("sa"),
        sum(col("yb")).as("sb"), sum(col("xa") * col("yb")).as("sab"))
    val nD = col("n").cast("double")
    val mx = col("sx").cast("double") / nD
    val my = col("sy").cast("double") / nD
    val dx = col("sxx").cast("double") - mx * col("sx").cast("double")
    val dy = col("syy").cast("double") - my * col("sy").cast("double")
    pairs.crossJoin(broadcast(totals))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        when(dx > 0.0 && dy > 0.0,
          round((col("sab").cast("double") - my * col("sa").cast("double") -
            mx * col("sb").cast("double") +
            col("n_pairs").cast("double") * mx * my) / sqrt(dx * dy), 6))
          .otherwise(lit(null).cast("double")).as("xcf"))
      .orderBy("lag")
  }

  /**
   * CLAMPED running balance — per key, fold the ordered deltas through
   * balance ← clamp(balance + δ, lo, hi) and report the final state:
   * the inventory / credit-ledger / token-bucket semantic. This is the
   * operator WINDOW FUNCTIONS CANNOT EXPRESS: the clamp makes the fold
   * non-associative (a prefix sum can't know how much earlier clamping
   * absorbed), so there is no partial aggregation and no window trick —
   * it is the batch face of the custom sequential state
   * `mapGroupsWithState` carries in streaming, here via `mapGroups`
   * over each key's ordered rows.
   *
   * Emits (key, n_events, final_balance, n_clamped_hi, n_clamped_lo);
   * the balance starts at clamp(0). Ordering is (ordCol, tieCol) —
   * both long-sortable, tie-broken exactly.
   *
   * Deterministic: integer deltas, integer clamp, total order.
   *
   * Scale: one key shuffle; each key's rows fold IN MEMORY inside its
   * group (per-entity event streams are small — the same contract as
   * sessionize's window sort, minus the window). State per key is
   * three longs; the streaming twin keeps only those forever.
   */
  def clampedBalance(df: DataFrame, keyCol: String, ordCol: String,
                     tieCol: String, deltaCol: String,
                     lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"bad bounds [$lo, $hi]")
    val spark = df.sparkSession
    import spark.implicits._
    val start = math.min(hi, math.max(lo, 0L))
    df.select(col(keyCol).cast("long"), col(ordCol).cast("long"),
        col(tieCol).cast("long"), col(deltaCol).cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var bal = start
        var nhi = 0L
        var nlo = 0L
        rows.foreach { r =>
          val raw = bal + r._4
          if (raw > hi) { nhi += 1; bal = hi }
          else if (raw < lo) { nlo += 1; bal = lo }
          else bal = raw
        }
        (k, rows.length.toLong, bal, nhi, nlo)
      }
      .toDF(keyCol, "n_events", "final_balance", "n_clamped_hi",
        "n_clamped_lo")
  }

  /**
   * MASE readout — Mean Absolute Scaled Error of the SEASONAL-NAIVE
   * forecast (y_{t−season}) against the plain naive baseline (y_{t−1})
   * over a daily count series: mase < 1 means the seasonal pattern is
   * real forecasting signal ("Mondays predict Mondays better than
   * yesterday does"), mase ≥ 1 means the apparent weekly shape is
   * noise. The scale-free forecast-quality number (Hyndman & Koehler) —
   * unlike MAPE it survives zero-count days, and "scaled" means it
   * compares across series of any magnitude.
   *
   * One row: (n_days, mae_seasonal, mae_naive, mase 6dp). Deterministic:
   * daily counts and both absolute-error sums are exact integers; two
   * mean divisions + one ratio in pinned double order.
   *
   * Scale: one day-grain aggregate (partial-aggregating), two lag
   * windows over the day-count-sized series, a 1-row rollup — events
   * never shuffle.
   */
  def maseReport(df: DataFrame, ts: String, season: Int = 7): DataFrame = {
    require(season >= 2, s"bad season $season")
    val daily = df.filter(col(ts).isNotNull)
      .groupBy(date_trunc("day", col(ts)).as("day"))
      .agg(count(lit(1)).as("__n"))
    // unpartitioned window BOUND: day-grid rows
    val w = Window.orderBy(col("day").asc)
    daily
      .select(col("day"), col("__n"),
        lag(col("__n"), season).over(w).as("__s"),
        lag(col("__n"), 1).over(w).as("__p"))
      // score only days where BOTH forecasts exist — same denominator
      .filter(col("__s").isNotNull && col("__p").isNotNull)
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("__n") - col("__s"))).as("__es"),
        sum(abs(col("__n") - col("__p"))).as("__ep"))
      .select(col("n_days"),
        round(col("__es").cast("double") / col("n_days"), 6)
          .as("mae_seasonal"),
        round(col("__ep").cast("double") / col("n_days"), 6)
          .as("mae_naive"),
        when(col("__ep") > 0,
          round(col("__es").cast("double") / col("__ep"), 6))
          .as("mase"))
  }

  /**
   * MARKOV REMOVAL-EFFECT attribution (Anderl et al.'s data-driven
   * multi-touch model) — the principled complement of the last-touch
   * as-of attribution (`q_attribution`): build a first-order Markov
   * chain over each user's channel journey (truncated at the FIRST
   * conversion; non-converting journeys absorb into NULL), then credit
   * each channel by its REMOVAL EFFECT — how much the chain's
   * START→CONV absorption probability drops when every transition into
   * that channel is redirected to NULL. A channel that merely
   * co-occurs with conversions earns nothing unless paths actually
   * NEED it.
   *
   * Emits one row per channel: (channel, removal_effect 6dp,
   * attribution_share 6dp — removal effects normalized to sum 1); both
   * NULL when the full chain never converts.
   *
   * Absorption is the K-step probability (`iters`, default 50) — exact
   * for every journey of length ≤ K and the SQL-replayable form of the
   * fixed point (an exact linear solve has no deterministic SQL twin).
   * Cross-engine discipline: transition probabilities and each
   * iteration's state values are 9dp-rounded; the per-state update sums
   * the 9dp-rounded products EXACTLY (decimal), adds the CONV term in
   * one pinned double op, rounds 9dp — so any engine replaying the
   * recurrence lands on identical bits. Final effects/shares round 6dp.
   *
   * Scale: ONE window pass (journey truncation + lag/lead) + one
   * (src, dst) count aggregate over the events; the transition matrix —
   * (channels+3)² counts — is a bounded MODEL artifact collected to the
   * driver (the IVF-centroid economics), where the K·channels²·removals
   * recurrence costs microseconds at any corpus size.
   */
  def markovRemovalAttribution(df: DataFrame, userCol: String,
                               tsCol: String, tieCol: String,
                               typeCol: String, convType: String,
                               iters: Int = 50): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("__u").orderBy(col("__ts"), col("__tie"))
    val base = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(typeCol).as("__e"))
    // journey = the user's events up to and including the FIRST
    // conversion (prior-conversion count over PRECEDING rows = 0)
    val kept = base
      .withColumn("__pc",
        sum(when(col("__e") === convType, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("__pc"), lit(0L)) === 0L)
    val marked = kept
      .withColumn("__prev", lag(col("__e"), 1).over(w))
      .withColumn("__lastrow", lead(col("__e"), 1).over(w).isNull)
    val steps = marked.select(
      coalesce(col("__prev"), lit("START")).as("src"),
      when(col("__e") === convType, lit("CONV")).otherwise(col("__e"))
        .as("dst"))
    val terminals = marked
      .filter(col("__lastrow") && col("__e") =!= convType)
      .select(col("__e").as("src"), lit("NULL").as("dst"))
    // bounded model artifact: (channels + START) × (channels + CONV +
    // NULL) counts — never data
    val counts = steps.unionAll(terminals).groupBy("src", "dst")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val prob: Map[(String, String), Double] = counts.map { case (s, t, n) =>
      (s, t) -> r9(n.toDouble / totals(s))
    }.toMap
    val states = totals.keySet // every state with outgoing transitions
    val channels = states.filter(_ != "START").toSeq.sorted

    // K-step absorption from every state, with channel `removed`'s
    // inbound transitions redirected to NULL (None = the full chain)
    def absorb(removed: Option[String]): Double = {
      var p: Map[String, Double] = states.map(_ -> 0.0).toMap
      var i = 0
      while (i < iters) {
        p = states.map { s =>
          val terms = channels
            .filter(t => !removed.contains(t))
            .flatMap(t => prob.get((s, t)).map(tp => r9(tp * p(t))))
          val dec = terms.foldLeft(BigDecimal(0))((a, x) => a + BigDecimal(x))
          s -> r9(dec.toDouble + prob.getOrElse((s, "CONV"), 0.0))
        }.toMap
        i += 1
      }
      p.getOrElse("START", 0.0)
    }

    val pFull = absorb(None)
    val effects = channels.map { c =>
      c -> (if (pFull > 0.0) Some(r6(1.0 - absorb(Some(c)) / pFull))
            else None)
    }
    val totalEff = effects.flatMap(_._2)
      .foldLeft(BigDecimal(0))((a, x) => a + BigDecimal(x))
    val rows = effects.map { case (c, e) =>
      (c, e, e.flatMap(v =>
        if (totalEff.toDouble != 0.0) Some(r6(v / totalEff.toDouble))
        else None))
    }
    rows.toDF("channel", "removal_effect", "attribution_share")
  }

  /** Contiguous day-grid of daily VALUE TOTALS in exact integer cents —
    * the value-series sibling of [[dailyCountSeries]] ([[cusumChangePoint]]
    * builds the same shape inline): gap days enter as true zeros (a day
    * with no rows IS an observation of zero daily value). Returns
    * (idx, x) with x DECIMAL(38,0) cents. */
  private def dailyCentsSeries(df: DataFrame, ts: String,
                               valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = df.filter(col(ts).isNotNull)
      .select(date_trunc("day", col(ts)).as("day"),
        graft.ops.StatsOps.cents(col(valueCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("day").agg(sum(col("__v").cast(dec)).as("x"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dailyIdx = daily.crossJoin(broadcast(bounds))
      .select(datediff(col("day"), col("d0")).cast("long").as("idx"),
        col("x"), col("d0"))
    bounds
      .select(col("d0"), explode(sequence(lit(0L),
        datediff(col("d1"), col("d0")).cast("long"))).as("idx"))
      .join(dailyIdx.drop("d0"), Seq("idx"), "left")
      // timestampadd, not date_add: the grid day must stay TIMESTAMP
      // (date_trunc's type) so emitted days match the daily frame's
      .select(col("idx"),
        expr("timestampadd(DAY, CAST(idx AS INT), d0)").as("day"),
        coalesce(col("x"), lit(0L).cast(dec)).as("x"))
  }

  /**
   * PAGE–HINKLEY drift statistic on the daily value series — the
   * sequential change detector: PH_t = Σ_{i≤t}(xᵢ − mean(x₁..xᵢ) − δ),
   * alarm statistic M_t = PH_t − min_{s≤t} PH_s. Where
   * [[cusumChangePoint]] integrates deviation from the GLOBAL mean
   * (retrospective — it needs the whole series first), Page–Hinkley
   * deviates from the RUNNING mean, the form an online monitor
   * actually runs — so this readout answers "when would the live
   * drift alarm have fired, and how loudly" on historical data, the
   * backtest of the production monitor. δ (tolerance, value units)
   * suppresses sub-δ drift; δ=0 is the pure detector.
   *
   * Emits one row (n_days, at_day, ph_stat, direction): ph_stat =
   * max M_t in value units (6dp), at_day its day (earliest tie),
   * direction "up" (the mirrored detector on −x decides "down" — the
   * emitted statistic is the upward alarm; run on negated values for
   * the other side).
   *
   * Deterministic: daily totals are exact integer cents on the
   * contiguous grid (gap days = true zeros); each dev_t =
   * (t·x_t − CumS_t)/t − δ rounds to 6dp INDEPENDENTLY and the
   * partial sums run in DECIMAL — no float recursion (the
   * ewmaBaseline discipline).
   *
   * Scale: one day-grain partial aggregate + cumulative windows over
   * the bounded day grid + a top-1 — the cusum cost class; event rows
   * never re-shuffle.
   */
  def pageHinkley(df: DataFrame, ts: String, valueCol: String,
                  delta: Double = 0.0): DataFrame = {
    val dterm = DecimalType(38, 6)
    val series = dailyCentsSeries(df, ts, valueCol)
    // unpartitioned window BOUND: contiguous day grid (one row per day)
    val wCum = Window.orderBy(col("idx").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val t = col("idx") + 1
    val devs = series
      .withColumn("__cs", sum(col("x")).over(wCum))
      .withColumn("__dev",
        round((t.cast("decimal(38,6)") * col("x") - col("__cs"))
          .cast("double") / t.cast("double") / 100.0 - delta, 6)
          .cast(dterm))
    val ph = devs.withColumn("__ph", sum(col("__dev")).over(wCum))
      .withColumn("__mn", min(col("__ph")).over(wCum))
      .withColumn("__m", col("__ph") - col("__mn"))
    ph.orderBy(col("__m").desc, col("idx").asc).limit(1)
      .crossJoin(broadcast(series.agg(count(lit(1)).as("n_days"))))
      .select(col("n_days"), col("day").as("at_day"),
        round(col("__m").cast("double"), 6).as("ph_stat"),
        lit("up").as("direction"))
  }

  /**
   * PERMUTATION ENTROPY (order m=3) of the daily value series — the
   * complexity of the series' ORDER PATTERNS: each consecutive triple
   * (x_t, x_{t+1}, x_{t+2}) maps to one of 3! = 6 ordinal patterns
   * (ties broken toward the earlier index, the standard convention),
   * and H = −Σ p·ln p over the pattern distribution, normalized by
   * ln 6 to [0, 1]. A flat or strictly trending series scores ~0 (one
   * pattern dominates), i.i.d. noise scores ~1 — the model-free
   * "is this metric structured or random" number that, unlike
   * [[acf]]/spectral readouts, is invariant to any monotone transform
   * of the values (it never reads magnitudes, only orderings).
   *
   * Emits one row (n_windows, n_patterns, perm_entropy,
   * normalized_entropy), 6dp; fewer than 3 grid days emits no row.
   *
   * Deterministic: patterns are pure integer comparisons on exact-cent
   * totals over the contiguous grid (gap days = true zeros); the ≤6
   * per-pattern −p·ln p terms round to 8dp and sum through DECIMAL.
   *
   * Scale: one day-grain partial aggregate + two lead windows on the
   * bounded day grid + a ≤6-row reduce — the cusum cost class.
   */
  def permutationEntropy(df: DataFrame, ts: String,
                         valueCol: String): DataFrame = {
    val dterm = DecimalType(24, 8)
    val series = dailyCentsSeries(df, ts, valueCol)
    // unpartitioned window BOUND: contiguous day grid (one row per day)
    val wLead = Window.orderBy(col("idx").asc)
    val trip = series
      .withColumn("__b", lead(col("x"), 1).over(wLead))
      .withColumn("__c", lead(col("x"), 2).over(wLead))
      .filter(col("__b").isNotNull && col("__c").isNotNull)
    // ties break toward the earlier index: "later ≥ earlier" keeps the
    // earlier element ranked first, so each comparison is >=
    val pat = (when(col("__b") >= col("x"), 4).otherwise(0) +
      when(col("__c") >= col("x"), 2).otherwise(0) +
      when(col("__c") >= col("__b"), 1).otherwise(0)).as("__pat")
    val counts = trip.select(pat).groupBy("__pat")
      .agg(count(lit(1)).as("__c"))
    val tot = counts.agg(sum(col("__c")).as("__n"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    counts.crossJoin(broadcast(tot))
      .select(col("__n"),
        round(-p * log(p), 8).cast(dterm).as("__h"))
      .groupBy("__n")
      .agg(count(lit(1)).as("n_patterns"), sum(col("__h")).as("__H"))
      .select(col("__n").as("n_windows"), col("n_patterns"),
        round(col("__H").cast("double"), 6).as("perm_entropy"),
        round(col("__H").cast("double") / math.log(6.0), 6)
          .as("normalized_entropy"))
  }
}
