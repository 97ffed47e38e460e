package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.ext.DedupOps
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"== $name: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    // warm session
    docs.count()
    time("shingles-only") {
      docs.repartition(32)
        .select(col("doc_id"), DedupOps.shingleHashes(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).head(); 1L
    }
    time("signatures") {
      DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 16).count()
    }
    time("full-pairs") {
      DedupOps.minhashDedupPairs(docs, "doc_id", "text", 3, 16, 4, 0.4).count()
    }
    spark.stop()
  }
}
