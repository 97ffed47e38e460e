package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `graft_pq_encode(vec)` — all `m` product-quantization subspace codes of
 * an `array<float>` vector in ONE call against a codebook reference
 * object. The declarative form builds `m × codes` `struct(cosine, -j)`
 * entries inside one projection — at 8×16 that generated function blows
 * Janino's 64 KB method limit, Spark falls back to INTERPRETED eval, and
 * the "codegen'd" encode becomes the slowest stage of every PQ query.
 * This expression generates a single call into [[PqCodebooks]]
 * (`ctx.addReferenceObj`, the [[MultiPhraseHits]] pattern), keeping the
 * whole stage compiled and the per-row cost one fused primitive loop.
 *
 * Semantics are BIT-IDENTICAL to the struct-argmax form (spec-proven):
 * per subspace, cosine accumulates float→double in index order (the
 * [[CosineSimilarity]] kernel), rounds HALF_UP to 6 dp (`round(_, 6)` on
 * doubles routes through `BigDecimal.valueOf`), and ties break to the
 * SMALLER code id (the `struct(cs, -j)` max contract).
 */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends TextKernelExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override protected def expectedInput: DataType = ArrayType(FloatType)

  @transient private lazy val books = PqCodebooks(codebooks)

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    books.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPq", books,
      classOf[PqCodebooks].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
}

object PqEncode {
  def apply(c: org.apache.spark.sql.Column,
            codebooks: Seq[Seq[Seq[Float]]]): org.apache.spark.sql.Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), codebooks))
}

/** Flattened, serializable codebook tables + the encode kernel. */
final case class PqCodebooks(cb: Seq[Seq[Seq[Float]]]) extends Serializable {
  @transient private lazy val m = cb.length
  @transient private lazy val codes = cb.head.length
  @transient private lazy val w = cb.head.head.length
  // flat [s][j] -> float[w]
  @transient private lazy val flat: Array[Array[Float]] = {
    val out = new Array[Array[Float]](m * codes)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < codes) { out(s * codes + j) = cb(s)(j).toArray; j += 1 }
      s += 1
    }
    out
  }

  private def roundedCos(v: ArrayData, base: Int, book: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < book.length) {
      val x = v.getFloat(base + i).toDouble
      val y = book(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val raw = dot / (math.sqrt(na) * math.sqrt(nb))
    if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
    else java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  def encode(v: ArrayData): ArrayData = {
    if (v.numElements() < m * w) return null
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestJ = 0
      var bestScore = roundedCos(v, s * w, flat(s * codes))
      var j = 1
      while (j < codes) {
        val sc = roundedCos(v, s * w, flat(s * codes + j))
        // struct(cs, -j) max contract under Spark's double ordering
        // (java.lang.Double.compare: NaN greatest, -0 < 0); tie -> smaller j
        if (java.lang.Double.compare(sc, bestScore) > 0) {
          bestScore = sc; bestJ = j
        }
        j += 1
      }
      out(s) = bestJ
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
