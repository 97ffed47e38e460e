package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_phrase_hits(text)` — all blocklist phrases occurring in `text`,
 * matched in ONE pass over the text bytes by a serialized Aho–Corasick
 * automaton. The literal-fold form ([[graft.ext.TextOps.blocklistFilter]])
 * scans the text once PER PHRASE — O(|text|·|phrases|) — fine for tens of
 * phrases, hopeless for the thousands a production ban list carries; the
 * automaton is O(|text| + hits) regardless of phrase count. This closes
 * the "Aho–Corasick `Expression` seam" the blocklist gate documented.
 *
 * Matching is over raw UTF-8 bytes: an exact byte match of a valid UTF-8
 * phrase inside valid UTF-8 text IS a character match (UTF-8 never
 * aligns a sequence across character boundaries), and `UTF8String
 * .contains` — the literal form's primitive — compares the same bytes,
 * so the two forms are output-identical, duplicates and ordering
 * included (matched occurrences of the ORIGINAL phrase list, emitted in
 * lexicographic phrase order, the literal form's `array_sort` contract).
 *
 * The automaton rides the expression via `ctx.addReferenceObj`, so the
 * generated code calls straight into the prebuilt tables inside the
 * surrounding WholeStageCodegen stage — no per-row construction, no
 * closure, no encoder round-trip.
 */
case class MultiPhraseHits(child: Expression, phrases: Seq[String])
    extends graft.functions.TextKernelExpression {
  require(phrases.nonEmpty, "need at least one phrase")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_phrase_hits"
  override protected def expectedInput: DataType = StringType

  @transient private lazy val ac = AhoCorasick.build(phrases)

  override protected def withNewChildInternal(newChild: Expression): MultiPhraseHits =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    ac.findMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.findMatches($c)")
  }
}

object MultiPhraseHits {
  def apply(c: org.apache.spark.sql.Column,
            phrases: Seq[String]): org.apache.spark.sql.Column =
    ColumnBridge.column(MultiPhraseHits(ColumnBridge.expression(c), phrases))
}

/**
 * Serializable Aho–Corasick automaton over UTF-8 bytes. Children are
 * per-node sorted byte arrays probed by binary search (ban-list tries are
 * sparse — a dense 256-way table would serialize megabytes for nothing);
 * fail links and MERGED output lists are precomputed by the standard BFS,
 * so matching never chases fail chains for output collection.
 */
final class AhoCorasick private (
    childKeys: Array[Array[Byte]],
    childNext: Array[Array[Int]],
    fail: Array[Int],
    outputs: Array[Array[Int]],
    emitOrder: Array[Int],
    phraseBytes: Array[UTF8String]) extends Serializable {

  private def step(state0: Int, b: Byte): Int = {
    var state = state0
    while (true) {
      val idx = java.util.Arrays.binarySearch(childKeys(state), b)
      if (idx >= 0) return childNext(state)(idx)
      if (state == 0) return 0
      state = fail(state)
    }
    0
  }

  /** All matched occurrences of the original phrase list, lexicographic
    * phrase order (duplicate listed phrases emit duplicate hits). */
  def findMatches(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val hit = new Array[Boolean](phraseBytes.length)
    var state = 0
    var i = 0
    while (i < bytes.length) {
      state = step(state, bytes(i))
      val out = outputs(state)
      var j = 0
      while (j < out.length) { hit(out(j)) = true; j += 1 }
      i += 1
    }
    val acc = new java.util.ArrayList[AnyRef](4)
    var k = 0
    while (k < emitOrder.length) {
      val p = emitOrder(k)
      if (hit(p)) acc.add(phraseBytes(p))
      k += 1
    }
    new GenericArrayData(acc.toArray)
  }
}

object AhoCorasick {
  def build(phrases: Seq[String]): AhoCorasick = {
    val pb = phrases.map(p => p.getBytes("UTF-8")).toArray
    // growable trie: per-node child maps
    val kids = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Byte, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pb.zipWithIndex.foreach { case (bytes, pi) =>
      var node = 0
      bytes.foreach { b =>
        node = kids(node).getOrElseUpdate(b, {
          kids += scala.collection.mutable.TreeMap.empty[Byte, Int]
          ends += Nil
          kids.length - 1
        })
      }
      ends(node) = pi :: ends(node)
    }
    val n = kids.length
    val childKeys = Array.tabulate(n)(i => kids(i).keys.toArray)
    val childNext = Array.tabulate(n)(i => kids(i).values.toArray)
    val fail = new Array[Int](n)
    val outputs = new Array[Array[Int]](n)
    outputs(0) = ends(0).toArray
    // BFS fail links + merged outputs
    val queue = scala.collection.mutable.Queue.empty[Int]
    kids(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outputs(u) = (ends(u) ++ outputs(fail(u)).toList).toArray
      kids(u).foreach { case (b, v) =>
        var f = fail(u)
        var resolved = -1
        while (resolved < 0) {
          kids(f).get(b) match {
            case Some(next) => resolved = next
            case None if f == 0 => resolved = 0
            case None => f = fail(f)
          }
        }
        fail(v) = resolved
        queue += v
      }
    }
    // array_sort compares UTF8Strings (binary/code-point order), NOT Java
    // String UTF-16 order — sort the same way or non-ASCII lists diverge
    val u8 = phrases.map(UTF8String.fromString).toArray
    val emitOrder = phrases.indices.sortWith { (a, b) =>
      val c = u8(a).compareTo(u8(b)); c < 0 || (c == 0 && a < b)
    }.toArray
    new AhoCorasick(childKeys, childNext, fail, outputs, emitOrder,
      phrases.map(UTF8String.fromString).toArray)
  }
}
