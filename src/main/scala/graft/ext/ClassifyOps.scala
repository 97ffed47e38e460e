package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * [EXT] Seed-classifier scoring — the fasttext-shaped quality/domain
 * classifier every big curation pipeline runs (GPT-3's "WebText-like"
 * LR filter, CCNet's fasttext lang-id, Llama's wiki-reference
 * classifier): train a multinomial Naive Bayes model on a LABELED seed
 * corpus, score unlabeled documents, keep/route by predicted class and
 * confidence margin. Naive Bayes rather than LR because its training is
 * ONE aggregation pass (count tokens per class — no gradient loop), its
 * scores are exact integer-derived arithmetic (cross-engine oracle-able),
 * and at web scale the seed corpus is tiny next to the corpus being
 * scored — model quality is bounded by the seed, not the estimator.
 *
 * Cross-engine determinism: every per-token class log-likelihood is
 * 6dp-rounded BEFORE summation and the per-(doc, class) sum routes
 * through a DECIMAL accumulator, so posterior totals are exact decimals
 * — partition order cannot wiggle them, and argmax/margin are
 * bit-identical in any engine (the labelDispersion discipline, applied
 * to classifier scores).
 */
object ClassifyOps {

  /**
   * Train multinomial NB with add-one smoothing on `train` (labels in
   * `labelCol`), score every non-null-text row of `score`. Per class:
   * prior `ln(n_docs_c / N)`; per token `ln((cnt_c(t)+1)/(tot_c+V))`
   * over the training vocabulary `V` (union over classes). Score-time
   * tokens outside the training vocabulary are dropped — the standard
   * closed-vocabulary convention (they shift every class by a
   * near-constant and the seed can't rank what it never saw).
   *
   * Returns one row per scored doc: (`idCol`, actual = `score`'s
   * `labelCol`, predicted, log_post, margin) — `log_post` the winning
   * class's posterior, `margin` its lead over the runner-up (0.0 when a
   * single class exists; big margin = confident routing). Ties break
   * class-ascending, deterministically.
   *
   * Scale: training is one (class, token) hash agg over the SEED (tiny
   * by construction); the model — class priors and the V×K likelihood
   * matrix — is a broadcast artifact like IVF centroids. Scoring
   * shuffles (doc, token, tf) rows once to aggregate per-doc sums (the
   * word-count exchange every exact scheme pays; tf pre-aggregates
   * map-side so repeated tokens add no wire volume), equi-joins the
   * vocabulary-sized matrix (broadcast when it fits — Catalyst/AQE
   * picks), and ranks K rows per doc in doc-sized window
   * partitions. Corpus text never shuffles.
   */
  def nbClassify(train: DataFrame, score: DataFrame, idCol: String,
                 textCol: String, labelCol: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val trainToks = train.filter(col(textCol).isNotNull)
      .select(col(labelCol).as("__cls"),
        explode(TextOps.tokens(col(textCol))).as("__t"))
    val clsTok = trainToks.groupBy("__cls", "__t")
      .agg(count(lit(1)).as("__cnt"))
    val clsTot = clsTok.groupBy("__cls").agg(sum(col("__cnt")).as("__tot"))
    val vocabN = clsTok.select("__t").distinct()
      .agg(count(lit(1)).as("__v"))
    val priors = train.filter(col(textCol).isNotNull)
      .groupBy(col(labelCol).as("__cls")).agg(count(lit(1)).as("__nc"))
    val priorsN = priors.agg(sum(col("__nc")).as("__n"))
    val priorLp = priors.crossJoin(broadcast(priorsN))
      .select(col("__cls"),
        round(log(col("__nc").cast("double") / col("__n")), 6).cast(dec)
          .as("__prior"))
    // full V×K likelihood matrix (unseen (class, token) pairs get the
    // smoothed floor ln(1/(tot_c+V)) — they carry the discrimination)
    val matrix = clsTok.select("__t").distinct()
      .crossJoin(broadcast(clsTot.crossJoin(broadcast(vocabN))))
      .join(clsTok, Seq("__cls", "__t"), "left_outer")
      .select(col("__cls"), col("__t"),
        round(log((coalesce(col("__cnt"), lit(0L)) + 1).cast("double") /
          (col("__tot") + col("__v"))), 6).cast(dec).as("__lp"))
    val docTf = score.filter(col(textCol).isNotNull)
      .select(col(idCol), col(labelCol).as("actual"),
        explode(TextOps.tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("actual"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    val docCls = docTf.join(matrix, "__t")
      .groupBy(col(idCol), col("actual"), col("__cls"))
      .agg(sum(col("__tf") * col("__lp")).cast(dec).as("__ts"))
    // doc × class grid so all-OOV docs still rank every class by prior
    val grid = score.filter(col(textCol).isNotNull)
      .select(col(idCol), col(labelCol).as("actual"))
      .crossJoin(broadcast(priorLp))
    val posts = grid
      .join(docCls, Seq(idCol, "actual", "__cls"), "left_outer")
      .select(col(idCol), col("actual"), col("__cls"),
        (coalesce(col("__ts"), lit(0).cast(dec)) + col("__prior"))
          .cast(dec).as("__post"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__post").desc, col("__cls").asc)
    posts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__post"), 1).over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("actual"), col("__cls").as("predicted"),
        col("__post").cast("double").as("log_post"),
        coalesce((col("__post") - col("__next")).cast("double"), lit(0.0))
          .as("margin"))
  }

  /**
   * The model-eval companion: the confusion matrix of [[nbClassify]] on
   * held-out labeled data — (actual, predicted, n_docs). One K²-bounded
   * hash agg over the doc-level scores; the artifact a curation team
   * reads before trusting the classifier's routing.
   */
  def nbConfusion(train: DataFrame, heldOut: DataFrame, idCol: String,
                  textCol: String, labelCol: String): DataFrame =
    nbConfusion(nbClassify(train, heldOut, idCol, textCol, labelCol))

  /** [[nbConfusion]] off a PRE-SCORED frame ([[nbClassify]] output) — the
    * shared-artifact form: the classify/confusion/threshold-sweep family
    * reads one scored table instead of retraining + rescoring per
    * consumer (the trained-ANN-model economics on classifier scores). */
  def nbConfusion(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))

  /**
   * SELECTIVE-CLASSIFICATION threshold sweep — the calibration table a
   * curation team reads to pick the routing margin: at each candidate
   * threshold, how many held-out docs the classifier would route
   * (margin ≥ t) and how accurate it is on the routed slice. Monotone
   * coverage, (usually) rising accuracy — the knee is the operating
   * point. Returns (threshold, n_routed, n_correct, coverage, accuracy)
   * for every threshold in the grid, including empty slices
   * (accuracy NULL there — no routed docs to be right about).
   *
   * Scale: one pass over the doc-level scores ([[nbClassify]]'s
   * contract) crossed with the tiny broadcast grid — conditional sums,
   * so the aggregate shuffles |grid| rows per partition, never docs.
   */
  def nbThresholdSweep(train: DataFrame, heldOut: DataFrame, idCol: String,
                       textCol: String, labelCol: String,
                       thresholds: Seq[Double]): DataFrame =
    nbThresholdSweep(
      nbClassify(train, heldOut, idCol, textCol, labelCol), thresholds)

  /** [[nbThresholdSweep]] off a PRE-SCORED frame — see [[nbConfusion]]'s
    * shared-artifact rationale. */
  def nbThresholdSweep(scored: DataFrame,
                       thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val grid = scored.sparkSession.range(1)
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"))
    val total = scored.agg(count(lit(1)).as("__n"))
    scored.crossJoin(broadcast(grid))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("margin") >= col("threshold"), 1L).otherwise(0L))
          .as("n_routed"),
        sum(when(col("margin") >= col("threshold") &&
            col("actual") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .crossJoin(broadcast(total))
      .select(col("threshold"), col("n_routed"), col("n_correct"),
        round(col("n_routed").cast("double") / col("__n"), 6).as("coverage"),
        round(col("n_correct").cast("double") /
          nullif(col("n_routed"), lit(0L)), 6).as("accuracy"))
  }
}
