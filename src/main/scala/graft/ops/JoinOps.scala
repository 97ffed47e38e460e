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
   * and probing each left row's cell ±1 turns it into ONE equi-join
   * (every qualifying pair lands in exactly one probed bucket, so no
   * dedup step is needed); the exact band filter then drops the ≤3×
   * fanout's false candidates. Shuffle is O(3|L| + |R|) bucket-keyed
   * rows — the 1-D analog of the embedding near-dup bucketing
   * (`SimilarityOps.cosineNearDupPairs`).
   *
   * Value columns must be distinctly named across the two inputs.
   */
  def bandJoin(left: DataFrame, right: DataFrame, leftVal: String,
               rightVal: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(!left.columns.toSet.intersect(right.columns.toSet).exists(_ => true),
      "left/right column names must not overlap")
    val probes = left
      .withColumn("_b", floor(col(leftVal) / eps).cast("long"))
      .withColumn("_probe",
        explode(array(col("_b") - 1, col("_b"), col("_b") + 1)))
      .drop("_b")
    val bucketed = right
      .withColumn("_rb", floor(col(rightVal) / eps).cast("long"))
    probes.join(bucketed, col("_probe") === col("_rb"))
      .filter(abs(col(leftVal) - col(rightVal)) <= eps)
      .drop("_probe", "_rb")
  }
}
