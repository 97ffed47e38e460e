package graft.ext

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted IVF index — the build-once / query-many deployment of the
 * [[SimilarityOps]] ANN stack. The corpus is written PARTITIONED BY ITS
 * IVF CELL, which turns the in-memory "scan only the probed cells'
 * rows" join into on-disk PARTITION PRUNING: a query batch probing
 * nprobe of c cells physically reads ~nprobe/c of the index files and
 * skips the rest at the directory level. Centroids persist alongside as
 * the (tiny) model artifact. At 100 TB this is the difference between
 * an ANN query costing a full corpus scan and costing only the touched
 * cells' IO — and the index is built once, amortized over every
 * subsequent query batch.
 *
 * Layout: `path/centroids/` (cid, vec) parquet; `path/cells/cell=N/`
 * corpus rows. Rebuild = overwrite both; the swap discipline of
 * [[graft.sources.Stores]] marts applies if readers are live.
 */
object AnnIndexStore {

  /** Build and persist the index: assign each corpus row to its nearest
    * centroid and write rows partitioned by cell, centroids beside them. */
  def save(path: String, corpus: DataFrame, idCol: String, vecCol: String,
           centroids: Seq[(Long, Seq[Float])]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    SimilarityOps.ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells")
    centroids.toDF("cid", "vec")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incremental index growth: assign ONLY the new rows against the
    * persisted centroids and append them into their cell partitions —
    * O(batch), never O(corpus); the daily-ingest path. Results after
    * append are identical to a full rebuild under the same centroids
    * (spec-proven), because assignment is per-row and cells are
    * append-only. Re-train + full rebuild remains the move when drift
    * makes the frozen centroids a bad partition of the new data. */
  def append(path: String, newRows: DataFrame, idCol: String,
             vecCol: String): Unit = {
    val centroids = loadCentroids(newRows.sparkSession, path)
    SimilarityOps.ivfAssign(newRows, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/cells")
  }

  /** The persisted centroid artifact, in [[SimilarityOps.ivfAssign]]'s
    * in-memory shape (bounded by c — a model, not data). */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Long, Seq[Float])] =
    spark.read.parquet(s"$path/centroids")
      .select("cid", "vec")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1)

  /**
   * Top-k neighbors for a query batch against the PERSISTED index.
   * Probed cell ids are collected first (≤ |Q|·nprobe longs — a bounded
   * artifact) and pushed as a LITERAL `isin` filter, so Catalyst prunes
   * unprobed `cell=` directories statically — the executed plan's scan
   * carries the partition filter, no full-index listing or read. Scoring
   * and the bounded-heap top-k are identical to
   * [[SimilarityOps.ivfTopK]], so results match the in-memory operator
   * bit-for-bit at equal parameters.
   */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int,
           nprobe: Int = 1): DataFrame = {
    GraftFunctions.register(spark)
    val centroids = loadCentroids(spark, path)
    val q = SimilarityOps.ivfProbeCells(queries, centroids, vecCol, nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))
    val probed = q.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val cells = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cv"), col("cell"))
    val scored = cells.join(q, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", SimilarityOps.cosineNative(col("qv"), col("cv")))
    SimilarityOps.heapTopK(scored, k)
  }
}
