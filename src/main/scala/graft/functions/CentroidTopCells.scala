package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `graft_centroid_cells(vec)` — the `k` nearest centroid cell ids of an
 * `array<float>` vector (best rounded-cosine first, ties toward the
 * smaller cell id), computed in ONE call against a centroid reference
 * object. Same motivation as [[PqEncode]]: the declarative form builds
 * one `struct(cosine, -cid)` per centroid inside a single projection —
 * fine at the test fixture's 8 cells, but production IVF runs hundreds
 * to thousands of cells, where the generated method crosses Janino's
 * 64 KB limit and the whole stage silently drops to interpreted eval.
 * The centroids ride `ctx.addReferenceObj`; scoring is one fused loop.
 *
 * Ordering is bit-identical to `reverse(array_sort(struct(cs, -cid)))`:
 * scores are [[CosineSimilarity]]-kernel cosines rounded HALF_UP to
 * 6 dp, compared under Spark's double ordering (NaN greatest, −0 < 0).
 */
case class CentroidTopCells(child: Expression,
                            centroids: Seq[(Long, Seq[Float])], k: Int)
    extends TextKernelExpression {
  require(centroids.nonEmpty, "need at least one centroid")
  require(k >= 1, s"bad k $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_centroid_cells"
  override protected def expectedInput: DataType = ArrayType(FloatType)

  @transient private lazy val table = CentroidTable(centroids, k)

  override protected def withNewChildInternal(newChild: Expression): CentroidTopCells =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    table.topCells(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCents", table,
      classOf[CentroidTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.topCells($c)")
  }
}

object CentroidTopCells {
  def apply(c: org.apache.spark.sql.Column,
            centroids: Seq[(Long, Seq[Float])],
            k: Int): org.apache.spark.sql.Column =
    ColumnBridge.column(
      CentroidTopCells(ColumnBridge.expression(c), centroids, k))
}

/** Serializable centroid table + the top-k-cells kernel. */
final case class CentroidTable(cents: Seq[(Long, Seq[Float])], k: Int)
    extends Serializable {
  @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val vecs: Array[Array[Float]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val kk = math.min(k, cents.length)

  private def roundedCos(v: ArrayData, c: Array[Float]): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val y = c(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val raw = dot / (math.sqrt(na) * math.sqrt(nb))
    if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
    else java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** (score, cid) beats (bestS, bestId) under the struct(cs, -cid) max:
    * higher score first (Double.compare: NaN greatest), tie → smaller id. */
  private def beats(s: Double, id: Long, bestS: Double, bestId: Long): Boolean = {
    val c = java.lang.Double.compare(s, bestS)
    c > 0 || (c == 0 && id < bestId)
  }

  def topCells(v: ArrayData): ArrayData = {
    val selS = new Array[Double](kk)
    val selId = new Array[Long](kk)
    var filled = 0
    var i = 0
    while (i < ids.length) {
      val s = roundedCos(v, vecs(i))
      val id = ids(i)
      if (filled < kk) {
        // insertion into the sorted prefix
        var p = filled
        while (p > 0 && beats(s, id, selS(p - 1), selId(p - 1))) {
          selS(p) = selS(p - 1); selId(p) = selId(p - 1); p -= 1
        }
        selS(p) = s; selId(p) = id
        filled += 1
      } else if (beats(s, id, selS(kk - 1), selId(kk - 1))) {
        var p = kk - 1
        while (p > 0 && beats(s, id, selS(p - 1), selId(p - 1))) {
          selS(p) = selS(p - 1); selId(p) = selId(p - 1); p -= 1
        }
        selS(p) = s; selId(p) = id
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      java.util.Arrays.copyOf(selId, filled))
  }
}
