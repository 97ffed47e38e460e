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

  private object ExpressionEncoderHolder {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    val seqDouble: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }
}
