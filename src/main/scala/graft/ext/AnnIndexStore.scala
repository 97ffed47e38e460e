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
    * centroid and write rows partitioned by (ingest batch, cell) — the
    * base build is batch 0; streaming/batch appends land in their own
    * `b=` partitions so a replayed batch OVERWRITES itself instead of
    * duplicating (the exactly-once-at-directory-level discipline of
    * [[graft.streaming.StreamingPipeline]] ingest). Cell pruning is
    * unaffected: `cell` stays a partition column at the leaf level. */
  def save(path: String, corpus: DataFrame, idCol: String, vecCol: String,
           centroids: Seq[(Long, Seq[Float])]): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    writeBatch(path, corpus, idCol, vecCol, centroids, batchId = 0L)
    centroids.toDF("cid", "vec")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  private def writeBatch(path: String, rows: DataFrame, idCol: String,
                         vecCol: String, centroids: Seq[(Long, Seq[Float])],
                         batchId: Long): Unit =
    SimilarityOps.ivfAssign(rows, centroids, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/cells/b=$batchId")

  /** Incremental index growth: assign ONLY the new rows against the
    * persisted centroids and land them in their own `b=batchId` ingest
    * partition — O(batch), never O(corpus); the daily/streaming-ingest
    * path. Results after append are identical to a full rebuild under
    * the same centroids (spec-proven), and a REPLAYED batch id
    * overwrites its own partition instead of duplicating, so
    * at-least-once delivery becomes exactly-once at the directory level.
    * Re-train + full rebuild remains the move when drift makes the
    * frozen centroids a bad partition of the new data. */
  def append(path: String, newRows: DataFrame, idCol: String,
             vecCol: String, batchId: Long = 1L): Unit = {
    require(batchId > 0, "batchId 0 is the base build")
    val centroids = loadCentroids(newRows.sparkSession, path)
    writeBatch(path, newRows, idCol, vecCol, centroids, batchId)
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
