package graft.functions

import graft.ext.HashKernel
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * `graft_shingle_explode(text, n)` — a native table-generating function
 * (Catalyst `Generator`, the UDTF extension point): emits one
 * `(pos int, sh bigint)` row per distinct word-n-gram shingle hash of the
 * document, in first-occurrence order.
 *
 * Why a Generator and not `posexplode(graft_shingles(text, n))`: explode
 * of an expression first MATERIALIZES the whole array per row — for a long
 * document that is an O(shingles) allocation held live across the
 * generate, and under whole-stage codegen the array is built even when a
 * downstream limit/filter consumes only a prefix. A Generator hands
 * `GenerateExec` an iterator; rows stream out one at a time with no
 * intermediate array in the loop. Same HashKernel semantics, so the SQL
 * oracle (grams → md5-prefix → first-occurrence rank) agrees exactly.
 *
 * Generators are evaluated by `GenerateExec` via `eval` (Spark's own
 * non-collection generators do the same) — `CodegenFallback` here is the
 * standard shape, not a hot-path regression: the per-row kernel call is
 * the cost, exactly as in the expression form.
 */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("sh", LongType, nullable = false)))

  override def prettyName: String = "graft_shingle_explode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleExplode =
    copy(child = newChild)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Iterator.empty
    else {
      val hashes = HashKernel.shingles(text.toString, n)
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < hashes.length
        override def next(): InternalRow = {
          val row = InternalRow(i, hashes(i))
          i += 1
          row
        }
      }
    }
  }
}

object ShingleExplode {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleExplode(ColumnBridge.expression(c), n))
}
