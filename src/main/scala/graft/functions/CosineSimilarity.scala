package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `graft_cosine(a, b)` — cosine similarity of two `array<float>` columns as
 * a native Catalyst expression with whole-stage codegen.
 *
 * Why an Expression and not the higher-order-function composition
 * (`aggregate(zip_with(a, b, *), 0.0, +)`): Spark's lambda functions are
 * CodegenFallback — every element evaluation walks an interpreted expression
 * tree with boxed accumulators. For a d-dim embedding that is 3d interpreted
 * calls per pair (dot + two norms); inside a top-k scoring join it dominates
 * the query. This expression compiles to a single fused primitive loop
 * (one pass computes dot, |a|², |b|²) inside the surrounding
 * WholeStageCodegen stage — no boxing, no virtual calls.
 *
 * Semantics (kept bit-identical to the HOF form so the DuckDB oracle
 * agrees): elements are widened float→double before multiply; accumulation
 * is double in index order; result = dot / (sqrt(|a|²) · sqrt(|b|²)) with
 * IEEE division (0-norm → NaN/Inf, as in the HOF form). Null array, null
 * element, or length mismatch → null (zip_with pads with null, which
 * nullifies the HOF sum — same contract).
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  /** Can produce null from NON-null inputs (length mismatch, null element),
    * so nullability must not be inherited from the children — with
    * non-nullable inputs the default would declare the column non-nullable
    * and a null result would silently read back as 0.0. (Same override
    * Spark's ElementAt/GetArrayItem carry for the same reason.) */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = x.getFloat(i).toDouble
      val yb = y.getFloat(i).toDouble
      dot += xa * yb
      na += xa * xa
      nb += yb * yb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xa = (double) $a.getFloat($i);
         |    final double $yb = (double) $b.getFloat($i);
         |    $dot += $xa * $yb;
         |    $na += $xa * $xa;
         |    $nb += $yb * $yb;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
}

/** Registration for [[CosineSimilarity]] — both forms Spark supports. */
object GraftFunctions {

  val cosineName = "graft_cosine"

  private def cosineEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(cosineName),
    new ExpressionInfo(classOf[CosineSimilarity].getName, cosineName),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$cosineName expects 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  val jaroWinklerName = "graft_jaro_winkler"

  private def jaroWinklerEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(jaroWinklerName),
    new ExpressionInfo(classOf[JaroWinkler].getName, jaroWinklerName),
    (children: Seq[Expression]) => {
      require(children.length == 2, s"$jaroWinklerName expects 2 arguments")
      JaroWinkler(children.head, children(1))
    })

  val fp60Name = "graft_fp60"

  private def fp60Entry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(fp60Name),
    new ExpressionInfo(classOf[Fingerprint60].getName, fp60Name),
    (children: Seq[Expression]) => {
      require(children.length == 1, s"$fp60Name expects 1 argument")
      Fingerprint60(children.head)
    })

  /** Second-argument-as-int-literal extractor for the kernel functions
    * whose tuning parameter (n, k, numHashes…) must be plan-time constant. */
  private def intLit(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _: org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int parameter, got $other")
  }

  private def kernelEntries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_shingles", classOf[ShingleHashes].getName,
      (c: Seq[Expression]) => ShingleHashes(c.head, intLit("graft_shingles", c(1)))),
    ("graft_minhash", classOf[MinhashSignature].getName,
      (c: Seq[Expression]) => MinhashSignature(c.head, intLit("graft_minhash", c(1)))),
    ("graft_char_kgrams", classOf[CharKgrams].getName,
      (c: Seq[Expression]) => CharKgrams(c.head, intLit("graft_char_kgrams", c(1)))),
    ("graft_word_grams", classOf[WordGrams].getName,
      (c: Seq[Expression]) => WordGrams(c.head, intLit("graft_word_grams", c(1)))),
    ("graft_skipgram_pairs", classOf[SkipGramPairs].getName,
      (c: Seq[Expression]) => SkipGramPairs(c.head, intLit("graft_skipgram_pairs", c(1)))),
    ("graft_shingle_explode", classOf[ShingleExplode].getName,
      (c: Seq[Expression]) => ShingleExplode(c.head, intLit("graft_shingle_explode", c(1)))),
    ("graft_overlap_ge", classOf[OverlapGeCount].getName,
      (c: Seq[Expression]) => OverlapGeCount(c(0), c(1), c(2)))
  ).map { case (name, cls, builder) =>
    (FunctionIdentifier(name), new ExpressionInfo(cls, name), builder)
  }

  /** Idempotent session-scoped registration — lets library operators
    * (e.g. [[graft.ext.SimilarityOps]]) use the functions on any session
    * without requiring the `spark.sql.extensions` config. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    (Seq(cosineEntry, fp60Entry, jaroWinklerEntry) ++ kernelEntries).foreach {
      case (id, info, builder) =>
        if (!registry.functionExists(id)) {
          registry.registerFunction(id, info, builder)
        }
    }
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the standard
  * cluster-wide injection point for the engine's native functions AND the
  * custom planner pieces (interval-join rewrite rule + strategy). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.cosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, GraftFunctions.cosineName),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.fp60Name),
      new ExpressionInfo(classOf[Fingerprint60].getName, GraftFunctions.fp60Name),
      (children: Seq[Expression]) => Fingerprint60(children.head)))
    ext.injectFunction((
      FunctionIdentifier(GraftFunctions.jaroWinklerName),
      new ExpressionInfo(classOf[JaroWinkler].getName, GraftFunctions.jaroWinklerName),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1))))
    ext.injectOptimizerRule(_ => graft.plans.RewriteIntervalJoin)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
