package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `graft_overlap_ge(a, b, minOverlap)` — EARLY-EXIT sorted-merge overlap
 * count, the verification kernel of the set-similarity joins
 * ([[graft.ext.DedupOps.jaccardPairsPrefix]] / `containmentPairs`).
 *
 * Returns the exact |a ∩ b| when it is ≥ `minOverlap`, and **−1** the
 * moment the remaining-length bound proves it cannot be: during the merge
 * at positions (ia, ib), at most `min(|a|−ia, |b|−ib)` further matches
 * exist, so once `common + min(remaining) < minOverlap` the pair is
 * rejected without walking the rest of either array. `array_intersect`
 * +`size` — the form this replaces — always walks BOTH full arrays and
 * builds the intersection array on the heap per pair; for the dominant
 * below-threshold candidates the kernel exits after a short prefix and
 * allocates nothing.
 *
 * Contract (spec-proven output-identical to the `array_intersect` form):
 *  - result ≥ 0  ⇒ result = |a ∩ b| exactly;
 *  - result = −1 ⇒ |a ∩ b| < minOverlap (the caller's score filter would
 *    have dropped the pair anyway — callers pass the SAME relaxed
 *    pigeonhole minimum α used at candidate generation, under which every
 *    qualifying pair has overlap ≥ α);
 *  - minOverlap ≤ 0 ⇒ plain exact count (the bound can never trigger).
 *
 * PRECONDITION: both arrays sorted ascending with distinct non-null
 * elements — exactly what the shingle index produces (per-doc sets,
 * hash-sorted canonical order; the verify arrays are rebuilt with
 * `array_sort(collect_list(…))` since shuffles drop ordering). On
 * unsorted input the result would be a lower bound, not the count —
 * never fed by the library call sites.
 *
 * Native codegen for the same reason as [[CosineSimilarity]]: this sits
 * inside the candidate-verification join of the two most expensive bench
 * queries; a fused primitive `long` merge loop beats interpreted
 * set-intersection per pair by a wide margin and keeps the stage inside
 * WholeStageCodegen.
 */
case class OverlapGeCount(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>, bigint), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_overlap_ge"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): OverlapGeCount =
    copy(first = newFirst, second = newSecond, third = newThird)

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val min = m.asInstanceOf[Long]
    val na = x.numElements()
    val nb = y.numElements()
    var ia = 0
    var ib = 0
    var c = 0L
    while (ia < na && ib < nb) {
      if (c + math.min(na - ia, nb - ib) < min) return -1L
      val va = x.getLong(ia)
      val vb = y.getLong(ib)
      if (va == vb) { c += 1; ia += 1; ib += 1 }
      else if (va < vb) ia += 1
      else ib += 1
    }
    if (c < min) -1L else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      val c = ctx.freshName("c")
      val cut = ctx.freshName("cut")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $ia = 0;
         |int $ib = 0;
         |long $c = 0L;
         |boolean $cut = false;
         |while ($ia < $na && $ib < $nb) {
         |  if ($c + (long) java.lang.Math.min($na - $ia, $nb - $ib) < $m) {
         |    $cut = true; break;
         |  }
         |  final long $va = $a.getLong($ia);
         |  final long $vb = $b.getLong($ib);
         |  if ($va == $vb) { $c++; $ia++; $ib++; }
         |  else if ($va < $vb) { $ia++; } else { $ib++; }
         |}
         |${ev.value} = ($cut || $c < $m) ? -1L : $c;
       """.stripMargin
    })
}

object OverlapGeCount {
  /** Column form: exact |a∩b| when ≥ minOverlap, −1 otherwise. */
  def apply(a: Column, b: Column, minOverlap: Column): Column =
    ColumnBridge.column(OverlapGeCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(minOverlap)))
}
