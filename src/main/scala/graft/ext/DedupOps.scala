package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * [EXT] Deduplication operators for LLM training-data pipelines: exact
 * (hash-groupBy), word-shingle Jaccard, MinHash+LSH, SimHash. North-star
 * mandate (BASELINE.json), not in the reference — but they generalize the
 * reference's keyed idempotency (dag_mgo_pg_schedule_etl_qc.py:279-316:
 * "one row per _id") from key-equality to content-equality and
 * near-equality.
 *
 * Cross-engine hash: all hashing goes through [[TextOps.fingerprint60]]
 * (md5-prefix → bigint) so every operator here has an exact SQL oracle.
 * At real 100 TB scale xxhash64 is ~10× cheaper than md5 and is the drop-in
 * production choice (same 64-bit shape); md5 is used here because the
 * correctness gate demands a hash both engines compute identically.
 *
 * Scale notes:
 *  - exact dedup: one shuffle on the fingerprint. ~128 bits ⇒ no collision
 *    handling needed at any realistic corpus size.
 *  - MinHash/LSH: shuffle volume is O(docs × bands), never O(docs²); the
 *    band-bucket join only materializes genuine candidate pairs. Hot buckets
 *    (boilerplate shingles) are the skew risk — AQE skew-join splits them.
 *  - SimHash: per-doc signature is a narrow aggregation over tokens;
 *    near-dup lookup joins on rotated signature bands (not implemented as a
 *    query here — signature generation is the engine primitive).
 */
object DedupOps {

  import TextOps.{fingerprint60, tokens}

  /** Exact content dedup: keep one representative (min id) per distinct text
    * fingerprint. One hash-agg shuffle on the 128-bit fingerprint —
    * the only exact-dedup shape that works at 100 TB (never groupBy the
    * full text: the fingerprint is 16 bytes, the document is unbounded). */
  def dedupExactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of a text column, as an array of distinct 60-bit
    * shingle hashes. Narrow (per-row) — transform+filter are codegen'd
    * higher-order functions, no explode until the caller needs one. */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(transform(grams, g => fingerprint60(g)))
  }

  /** Pairwise n-gram Jaccard near-dup pairs above `threshold`, via an
    * inverted index on shingle hash: explode shingles → self-join on shingle
    * → count common → |A∩B| / (|A|+|B|−|A∩B|). Shuffle is O(total shingles),
    * and only docs sharing ≥1 shingle ever meet — never a cross join.
    * (id1 < id2 keeps each pair once.) */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), n)).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnsRenamed(Map("id" -> "id1", "sz" -> "sz1")), "id1")
      .join(sizes.withColumnsRenamed(Map("id" -> "id2", "sz" -> "sz2")), "id2")
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("sz1") + col("sz2") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** MinHash signature: `numHashes` permutations simulated as
    * h_i(s) = fingerprint60(i ‖ ':' ‖ shingle-hash), signature[i] = min over
    * shingles. Output: one row per (id, i, minhash). Shuffle O(docs × hashes)
    * after a narrow explode — the standard scalable MinHash shape. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(shingleHashes(col(textCol), n)).as("sh"))
      .crossJoin(spark_range_df(df, numHashes))
      .withColumn("h", fingerprint60(concat(col("i"), lit(":"), col("sh"))))
      .groupBy("id", "i").agg(min("h").as("minhash"))

  private def spark_range_df(df: DataFrame, n: Int): DataFrame =
    df.sparkSession.range(n).toDF("i")

  /** LSH banding over minhash signatures: band key = md5 of the concatenated
    * band rows; docs sharing any band key become candidate pairs. With b
    * bands of r rows, P(candidate) = 1−(1−j^r)^b — the standard S-curve.
    * The band join shuffles O(docs × bands) rows of 16-byte keys; candidate
    * verification (exact Jaccard) touches only surviving pairs. */
  def lshCandidatePairs(signatures: DataFrame, bands: Int, rows: Int): DataFrame = {
    val banded = signatures
      .withColumn("band", (col("i") / rows).cast("int"))
      .groupBy("id", "band")
      .agg(md5(concat_ws(",",
        transform(sort_array(collect_list(struct(col("i"), col("minhash")))),
          s => s.getField("minhash")))).as("band_key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact-Jaccard verification ≥ threshold. */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int, bands: Int,
                        threshold: Double): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, n, numHashes)
    val cands = lshCandidatePairs(sigs, bands, numHashes / bands)
    val withText = df.select(col(idCol).as("id"), col(textCol).as("__t"))
    val verified = cands
      .join(withText.withColumnsRenamed(Map("id" -> "id1", "__t" -> "t1")), "id1")
      .join(withText.withColumnsRenamed(Map("id" -> "id2", "__t" -> "t2")), "id2")
      .withColumn("j", jaccardExpr(col("t1"), col("t2"), n))
      .filter(col("j") >= threshold)
      .select(col("id1"), col("id2"), col("j").as("jaccard"))
    verified
  }

  /** Exact Jaccard of two texts' shingle sets as a single expression —
    * used to verify LSH candidates without another shuffle. */
  def jaccardExpr(t1: Column, t2: Column, n: Int): Column = {
    val s1 = shingleHashes(t1, n)
    val s2 = shingleHashes(t2, n)
    val inter = size(array_intersect(s1, s2)).cast("double")
    round(inter / (size(s1) + size(s2) - inter), 4)
  }

  /** SimHash (bitwise-majority) signature over token hashes, `bits` wide
    * (≤ 32 here; production uses 64 via two 32-bit halves). Per doc:
    * for each bit b, sum ±1 over tokens' hash-bit b; signature bit = sign.
    * Shape: explode tokens × bits → two-level agg. Shuffle O(tokens × bits);
    * at scale one aggregates the ±1 contributions map-side first (partial
    * agg does this automatically). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        bits: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("t"))
      .withColumn("h", fingerprint60(col("t")))
    val contrib = tok
      .crossJoin(spark_range_df(df, bits).withColumnRenamed("i", "b"))
      .withColumn("delta",
        when(expr("shiftright(h, cast(b as int))").bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      .groupBy("id", "b").agg(sum("delta").as("s"))
    contrib
      .withColumn("bitval",
        when(col("s") > 0, expr("shiftleft(1L, cast(b as int))")).otherwise(0L))
      .groupBy("id").agg(sum("bitval").as("simhash"))
  }
}
