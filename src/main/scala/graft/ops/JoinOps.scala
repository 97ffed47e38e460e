package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Join-strategy operators for predicates Catalyst can only execute as a
 * nested loop. Sibling of the custom point-in-interval plan stack
 * (`plans/IntervalJoin.scala`) — that one rewrites keyless interval
 * probes; this one equi-izes scalar band predicates declaratively.
 */
object JoinOps {

  /**
   * Banded numeric join: all (left, right) pairs with
   * `|leftVal − rightVal| ≤ eps`. A plain theta join on that predicate
   * gives Catalyst nothing to hash on → BroadcastNestedLoopJoin,
   * O(|L|·|R|) comparisons. Bucketing both sides by `eps`-width cells
   * and probing each left row's covering cell range turns it into ONE
   * equi-join (every qualifying pair lands in exactly one probed bucket,
   * so no dedup step is needed); the exact band filter then drops the
   * small fanout's false candidates. Shuffle is O(~3|L| + |R|)
   * bucket-keyed rows — the 1-D analog of the embedding near-dup
   * bucketing (`SimilarityOps.cosineNearDupPairs`).
   *
   * The probe range is derived as floor((v−eps)/eps)..floor((v+eps)/eps)
   * rather than cell±1: double division is monotone, so every right value
   * r with |v−r| ≤ eps (the exact filter's own comparison) has
   * floor(r/eps) inside that range — a ±1 probe can miss a qualifying
   * pair when quotient rounding at large magnitudes puts the two floors
   * two cells apart (e.g. |v1−v2| exactly eps with prices and eps=0.05).
   *
   * Value columns must be distinctly named across the two inputs.
   */
  def bandJoin(left: DataFrame, right: DataFrame, leftVal: String,
               rightVal: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(!left.columns.toSet.intersect(right.columns.toSet).exists(_ => true),
      "left/right column names must not overlap")
    val probes = left
      .withColumn("_lo", floor((col(leftVal) - eps) / eps).cast("long"))
      .withColumn("_hi", floor((col(leftVal) + eps) / eps).cast("long"))
      .withColumn("_probe", explode(sequence(col("_lo"), col("_hi"))))
      .drop("_lo", "_hi")
    val bucketed = right
      .withColumn("_rb", floor(col(rightVal) / eps).cast("long"))
    probes.join(bucketed, col("_probe") === col("_rb"))
      .filter(abs(col(leftVal) - col(rightVal)) <= eps)
      .drop("_probe", "_rb")
  }

  /**
   * Join PRE-FLIGHT audit: the exact output cardinality and worst-key
   * fan-out of `left ⋈ right` on an equi-key, computed WITHOUT running
   * the join — |L ⋈ R| = Σ_k cntL(k)·cntR(k) over the per-side key-count
   * aggregates. At 100 TB the counts shuffle |keys| rows instead of the
   * join's |rows|, so this is the cheap go/no-go gate before a blowup-
   * prone join: `est_join_rows` says whether the output fits the cluster,
   * `max_key_fanout` says whether ONE hot key will own the job (→ salt it
   * — [[graft.ext.DedupOps]]'s df caps and `q_salted_join` are the
   * mitigations this audit routes to).
   *
   * Returns one row: left/right row and distinct-key counts, matched key
   * count, exact join cardinality, and the largest single-key product.
   * All exact integers — cross-engine identical.
   */
  def joinPreflight(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String): DataFrame = {
    val cl = left.groupBy(col(leftKey).as("k"))
      .agg(count(lit(1)).as("cl"))
    val cr = right.groupBy(col(rightKey).as("k"))
      .agg(count(lit(1)).as("cr"))
    val lTot = cl.agg(sum(col("cl")).as("left_rows"),
      count(lit(1)).as("left_keys"))
    val rTot = cr.agg(sum(col("cr")).as("right_rows"),
      count(lit(1)).as("right_keys"))
    val matched = cl.join(cr, "k")
      .agg(count(lit(1)).as("matched_keys"),
        coalesce(sum(col("cl") * col("cr")), lit(0L)).as("est_join_rows"),
        coalesce(max(col("cl") * col("cr")), lit(0L)).as("max_key_fanout"))
    lTot.join(broadcast(rTot)).join(broadcast(matched))
      .select("left_rows", "left_keys", "right_rows", "right_keys",
        "matched_keys", "est_join_rows", "max_key_fanout")
  }
}
