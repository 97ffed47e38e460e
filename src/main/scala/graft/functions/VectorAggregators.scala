package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed UDAF surface: element-wise mean of embedding vectors — the
 * centroid-update step of k-means, and the third leg of the extensibility
 * triple (UDF = kernel functions, UDTF = generators, UDAF = this).
 *
 * `Aggregator` gets full partial aggregation: `reduce` runs map-side per
 * partition, `merge` combines partials on the reducer — so the shuffle
 * carries one (dim-array, count) buffer per group per partition, not rows.
 * At 100 TB that is the difference between shuffling the corpus and
 * shuffling #groups × #partitions small buffers.
 */
object VectorAggregators {

  final class VectorMean(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

    override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

    override def reduce(b: (Array[Double], Long),
                        a: Seq[Float]): (Array[Double], Long) = {
      if (a == null) b
      else {
        var i = 0
        val n = math.min(dim, a.length)
        while (i < n) { b._1(i) += a(i); i += 1 }
        (b._1, b._2 + 1)
      }
    }

    override def merge(x: (Array[Double], Long),
                       y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }

    override def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0L) null else b._1.map(_ / b._2).toSeq

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoderHolder.arrayDouble, Encoders.scalaLong)

    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoderHolder.seqDouble
  }

  /**
   * Bounded top-k by score with full partial aggregation — the scale fix
   * for exact top-k search. As a `Window.partitionBy(query).orderBy(score)`
   * rank, the shuffle carries EVERY scored pair (|Q|·|C| rows at exact
   * cosine top-k — at a 100 TB corpus that window shuffle is the job). As
   * an Aggregator, `reduce` prunes map-side per partition, so the shuffle
   * carries one ≤k-element buffer per (group, partition) — |Q|·k·partitions,
   * independent of corpus size.
   *
   * Input (score, neighborId); output the k best as (score, neighborId)
   * structs sorted by (score desc, neighborId asc) — ties resolved exactly
   * like the window form (`orderBy(score.desc, id.asc)`), so results are
   * bit-identical to the rank≤k filter.
   */
  final class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

    /** (score desc, id asc) with NaN ranked FIRST — java.lang.Double.compare
      * treats NaN as greater than +∞, exactly Spark's `orderBy(desc)`
      * semantics, so a NaN score (e.g. cosine of a zero vector) ranks
      * identically to the window form this aggregator replaced. A plain
      * `Ordering.by(-score)` would instead sort NaN last and silently drop
      * such rows from the top-k. */
    private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    // amortize the sort: let the buffer grow to a few k before pruning
    private val pruneAt = math.max(4 * k, 64)

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(b: Seq[(Double, Long)],
                        a: (Double, Long)): Seq[(Double, Long)] = {
      val nb = b :+ a
      if (nb.length >= pruneAt) nb.sorted(ord).take(k) else nb
    }

    override def merge(x: Seq[(Double, Long)],
                       y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (x ++ y).sorted(ord).take(k)

    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoderHolder.seqScored

    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoderHolder.seqScored
  }

  /**
   * Bounded k-smallest (key, id) pairs in exact lexicographic long order —
   * the deterministic-sampling sibling of [[TopKByScore]]. Used for
   * per-stratum caps ("keep at most k documents per domain, fingerprint-
   * ordered"): as a `Window.partitionBy(stratum) row_number`, the shuffle
   * carries the whole corpus; as an Aggregator, `reduce` prunes map-side,
   * so the shuffle carries ≤ #strata × k × partitions pairs. Keys are
   * exact LONGS (not doubles) so a 60-bit fingerprint never loses order
   * to floating-point rounding — selection is bit-identical to
   * `row_number().over(orderBy(key, id)) <= k`.
   */
  final class KSmallestPairs(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

    private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    private val pruneAt = math.max(4 * k, 64)

    override def zero: Seq[(Long, Long)] = Vector.empty

    override def reduce(b: Seq[(Long, Long)],
                        a: (Long, Long)): Seq[(Long, Long)] = {
      val nb = b :+ a
      if (nb.length >= pruneAt) nb.sorted(ord).take(k) else nb
    }

    override def merge(x: Seq[(Long, Long)],
                       y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (x ++ y).sorted(ord).take(k)

    override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      b.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoderHolder.seqLongPair

    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoderHolder.seqLongPair
  }

  /**
   * Bounded bottom-k-by-hash VALUE sample — the mergeable quantile-sketch
   * state ([[graft.ops.SketchOps]]). Keeps the k (hash, value) pairs with
   * the smallest hashes; because "k smallest of a fixed hash order" is a
   * pure function of the input SET, merge is exactly commutative and
   * associative, so the sketch is BIT-DETERMINISTIC under any partitioning
   * or merge order — unlike KLL/t-digest, whose compaction is
   * arrival-order dependent and would make a cross-run oracle flaky.
   * `reduce` prunes map-side, so the shuffle carries ≤ k·partitions pairs
   * per group regardless of corpus size. Ties (equal hashes from distinct
   * keys) break on value asc — still a total, deterministic order.
   */
  final class BottomKSample(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

    private val ord: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
      override def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Double.compare(a._2, b._2)
      }
    }
    private val pruneAt = math.max(4 * k, 64)

    override def zero: Seq[(Long, Double)] = Vector.empty

    override def reduce(b: Seq[(Long, Double)],
                        a: (Long, Double)): Seq[(Long, Double)] = {
      val nb = b :+ a
      if (nb.length >= pruneAt) nb.sorted(ord).take(k) else nb
    }

    override def merge(x: Seq[(Long, Double)],
                       y: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (x ++ y).sorted(ord).take(k)

    override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      b.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoderHolder.seqHashVal

    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoderHolder.seqHashVal
  }

  /**
   * KMV (k-minimum-values) SET sketch: the k smallest DISTINCT hashes of
   * the input. Unlike [[BottomKSample]] (a row sample keyed by a unique
   * id), this is a sketch of the key SET itself — duplicates collapse
   * inside the aggregator, so the state is a pure function of the
   * distinct key set. That purity is the whole contract: merging
   * sketches of OVERLAPPING sets is exactly the sketch of their union
   * (bottom-k of a set union), where additive sketches double-count.
   * Bit-deterministic under any partitioning or merge tree; supports
   * distinct-count, union, intersection, and Jaccard estimation
   * ([[graft.ops.SketchOps]] estimator columns).
   */
  final class KmvSetSketch(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {

    private val pruneAt = math.max(4 * k, 64)
    private def prune(b: Seq[Long]): Seq[Long] = b.distinct.sorted.take(k)

    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
      val nb = b :+ a
      if (nb.length >= pruneAt) prune(nb) else nb
    }

    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      prune(x ++ y)

    override def finish(b: Seq[Long]): Seq[Long] = prune(b)

    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoderHolder.seqLong

    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoderHolder.seqLong
  }

  private object ExpressionEncoderHolder {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    val seqDouble: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    val seqScored: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    val seqLongPair: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
    val seqHashVal: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
    val seqLong: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }
}
