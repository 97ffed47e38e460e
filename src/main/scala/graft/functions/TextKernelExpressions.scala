package graft.functions

import graft.ext.HashKernel
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen expressions for the text/dedup hot loops — the promotion
 * of the former Scala UDFs (shingles / minhash signature / LSH band keys /
 * char k-grams) to first-class Catalyst expressions, following the
 * [[Fingerprint60]] pattern. A Scala UDF costs an encoder round-trip
 * (UTF8String→String→result→Catalyst) per ROW plus a closure call that
 * blocks expression-level codegen fusion; these compile to a direct static
 * call inside the surrounding WholeStageCodegen stage and hand back
 * primitive `long[]` arrays with no boxing (`UnsafeArrayData
 * .fromPrimitiveArray`). The per-document semantics are unchanged — both
 * forms call the same [[graft.ext.HashKernel]] — so every DuckDB oracle
 * stays bit-identical.
 */
abstract class TextKernelExpression extends UnaryExpression {
  override def nullable: Boolean = true

  protected def expectedInput: DataType

  private def matchesInput(dt: DataType): Boolean = (dt, expectedInput) match {
    case (_: StringType, _: StringType) => true
    case (ArrayType(a, _), ArrayType(b, _)) => a == b
    case (a, b) => a == b
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (matchesInput(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ${expectedInput.simpleString}, got ${child.dataType.simpleString}")
}

/** `graft_shingles(text, n)` — distinct word-n-gram 60-bit shingle hashes,
  * first-occurrence order (see [[graft.ext.HashKernel.shingles]]). */
case class ShingleHashes(child: Expression, n: Int) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes$$.MODULE$$.kernel($c, $n)")
}

object ShingleHashes {
  def kernel(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(HashKernel.shingles(s.toString, n))

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
}

/** `graft_minhash(shingles, numHashes)` — MinHash signature over an
  * array of shingle hashes (see [[graft.ext.HashKernel.signature]]). */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def expectedInput: DataType = ArrayType(LongType)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.kernel(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSignature$$.MODULE$$.kernel($c, $numHashes)")
}

object MinhashSignature {
  def kernel(sh: ArrayData, numHashes: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      HashKernel.signature(sh.toLongArray(), numHashes))

  def apply(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(c), numHashes))
}

/** `graft_band_keys(shingles, numHashes, bands)` — LSH band keys of the
  * MinHash signature (see [[graft.ext.HashKernel.bandKeys]]). */
case class BandKeys(child: Expression, numHashes: Int, bands: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_band_keys"
  override protected def expectedInput: DataType = ArrayType(LongType)

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    BandKeys.kernel(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BandKeys$$.MODULE$$.kernel($c, $numHashes, $bands)")
}

object BandKeys {
  def kernel(sh: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val keys = HashKernel.bandKeys(
      HashKernel.signature(sh.toLongArray(), numHashes), bands, numHashes / bands)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  def apply(c: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(BandKeys(ColumnBridge.expression(c), numHashes, bands))
}

/** `graft_word_grams(text, n)` — word n-grams as strings, duplicates kept
  * in position order (the counting form behind repetition scoring; see
  * [[graft.ext.HashKernel.wordGrams]]). */
case class WordGrams(child: Expression, n: Int) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    WordGrams.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordGrams$$.MODULE$$.kernel($c, $n)")
}

object WordGrams {
  def kernel(s: UTF8String, n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashKernel.wordGrams(s.toString, n)
        .map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(c), n))
}

/** `graft_skipgram_pairs(text, window)` — ordered co-occurrence pairs
  * "a b" for every token pair within `window` positions (a before b),
  * duplicates kept: the word2vec/GloVe context-pair generator and the
  * windowed-PMI counting form. Adjacent bigrams miss collocations with
  * an intervening token ("New … York Times" survives "New York Times
  * Square" noise only under a window); the kernel emits all
  * Σ min(window, n−i−1) pairs in ONE text pass so pair generation never
  * explodes positions into a self-join. */
case class SkipGramPairs(child: Expression, window: Int)
    extends TextKernelExpression {
  require(window >= 1 && window <= 16, s"bad window $window")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_skipgram_pairs"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): SkipGramPairs =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    SkipGramPairs.kernel(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SkipGramPairs$$.MODULE$$.kernel($c, $window)")
}

object SkipGramPairs {
  def kernel(s: UTF8String, window: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < toks.length) {
      var j = i + 1
      val hi = math.min(toks.length - 1, i + window)
      while (j <= hi) {
        out += UTF8String.fromString(toks(i) + " " + toks(j))
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  def apply(c: Column, window: Int): Column =
    ColumnBridge.column(SkipGramPairs(ColumnBridge.expression(c), window))
}

/** `graft_repetition_stats(text, n)` — `[total n-grams, max single-gram
  * count]` in one kernel pass (see [[graft.ext.HashKernel.repetitionStats]]):
  * the per-row form of top-gram-share repetition scoring, so the statistic
  * is a narrow projection instead of an exploded-gram aggregation. */
case class RepetitionStats(child: Expression, n: Int) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats$$.MODULE$$.kernel($c, $n)")
}

object RepetitionStats {
  def kernel(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(HashKernel.repetitionStats(s.toString, n))

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c), n))
}

/** `graft_normalize_text(text)` — NFC + lowercase + whitespace-collapse +
  * trim canonicalization (see [[graft.ext.HashKernel.normalizeText]]):
  * the pre-dedup step that makes visually-identical documents hash
  * identically. */
case class NormalizeText(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText$$.MODULE$$.kernel($c)")
}

object NormalizeText {
  def kernel(s: UTF8String): UTF8String =
    UTF8String.fromString(HashKernel.normalizeText(s.toString))

  def apply(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}

/** `graft_segment_lang_ids(text, segWords)` — one language-ID label per
  * `segWords`-word segment in a single kernel pass (see
  * [[graft.ext.HashKernel.segmentLangIds]]): the per-row form of
  * `transform(segments, s => langIdHeuristic(s))`, whose interpreted
  * regex + four-stopword-scan tree per segment dominated the
  * code-switching query's CPU. */
case class SegmentLangIds(child: Expression, segWords: Int)
    extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_segment_lang_ids"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): SegmentLangIds =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    SegmentLangIds.kernel(input.asInstanceOf[UTF8String], segWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SegmentLangIds$$.MODULE$$.kernel($c, $segWords)")
}

object SegmentLangIds {
  def kernel(s: UTF8String, segWords: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.ext.HashKernel.segmentLangIds(s.toString, segWords)
        .map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])

  def apply(c: Column, segWords: Int): Column =
    ColumnBridge.column(SegmentLangIds(ColumnBridge.expression(c), segWords))
}

/** `graft_char_kgrams(text, k)` — character k-gram hashes in position
  * order, the winnowing base layer (see [[graft.ext.HashKernel.charKgrams]]). */
case class CharKgrams(child: Expression, k: Int) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_kgrams"
  override protected def expectedInput: DataType = StringType

  override protected def withNewChildInternal(newChild: Expression): CharKgrams =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    CharKgrams.kernel(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharKgrams$$.MODULE$$.kernel($c, $k)")
}

object CharKgrams {
  def kernel(s: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(HashKernel.charKgrams(s.toString, k))

  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(CharKgrams(ColumnBridge.expression(c), k))
}
