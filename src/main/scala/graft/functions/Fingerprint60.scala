package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * `graft_fp60(s)` — 60-bit md5-prefix fingerprint as a native expression:
 * bigint of the first 15 hex chars of md5(s). Bit-identical to the SQL
 * composition `conv(substring(md5(s), 1, 15), 16, 10)::bigint` (and to the
 * DuckDB oracle's `('0x' || substring(md5(s), 1, 15))::BIGINT`), but one
 * JVM call into [[graft.ext.HashKernel]] instead of four chained
 * expressions — `conv` alone allocates a BigInteger per row. Used by the
 * text/dedup operators both standalone and inside higher-order lambdas,
 * where each element evaluation is interpreted and the chain's cost
 * multiplies by collection size.
 */
case class Fingerprint60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fp60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): Fingerprint60 =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    graft.ext.HashKernel.fp60(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ext.HashKernel$$.MODULE$$.fp60($c.toString())")
}

object Fingerprint60 {
  /** Column form — buildable without touching any function registry. */
  def apply(c: Column): Column =
    ColumnBridge.column(Fingerprint60(ColumnBridge.expression(c)))
}

/**
 * Column ⇄ Expression bridge. Spark 4's `classic.ExpressionUtils` does
 * exactly this but is `private[sql]` at the Scala level (public in
 * bytecode) — reflection crosses that line once per COLUMN CONSTRUCTION
 * (plan build time, never per row). The registry route (`call_function`)
 * remains for SQL users; this one works with no session at hand.
 */
private[graft] object ColumnBridge {
  private val cls =
    Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private val toColumn = cls.getMethod("column", classOf[Expression])
  private val toExpression = cls.getMethod("expression", classOf[Column])

  def column(e: Expression): Column =
    toColumn.invoke(null, e).asInstanceOf[Column]

  def expression(c: Column): Expression =
    toExpression.invoke(null, c).asInstanceOf[Expression]
}
