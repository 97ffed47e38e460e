package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ext.TextOps

/**
 * Rendezvous (highest-random-weight) sharding — the consistent placement
 * scheme for a corpus spread over N storage/serving shards. Unlike
 * `hash(key) % N`, growing N → N+1 moves only the keys the NEW shard wins
 * (≈ 1/(N+1) of the corpus); a mod-N reshard moves ≈ N/(N+1) of it. At
 * 100 TB that's the difference between streaming ~6 TB to a new node and
 * rewriting the whole corpus.
 *
 * The per-(key, shard) weight rides the codebase's cross-engine hash,
 * [[TextOps.fingerprint60]] of `key ‖ ':' ‖ shard` (the
 * [[graft.ext.DedupOps]] minhash idiom) — a plain arithmetic LCG mix was
 * tried first and is degenerate here: for keys below the modulus the
 * score stays monotone in the shard index and every key lands on the
 * last shard. The fingerprint is folded to 31 bits and stretched to
 * `· N + s`, which makes scores injective across shards (distinct mod
 * N), so argmax needs no tie-break rule and the winner is recoverable
 * as `max_score mod N`. The whole assignment is therefore ONE
 * zero-shuffle codegen'd projection (`array_max` over a
 * `transform`-built score array) — no explode, no aggregation, no join
 * — and an engine-independent oracle replays the identical md5
 * arithmetic.
 */
object ShardOps {

  /** Highest-random-weight score max for `key` over shards 0..n−1. */
  private def rendezvousMax(key: Column, nShards: Int): Column =
    array_max(transform(sequence(lit(0), lit(nShards - 1)), s =>
      pmod(TextOps.fingerprint60(
          concat(key.cast("string"), lit(":"), s.cast("string"))),
        lit(2147483648L)) * nShards + s.cast(LongType)))

  /** The shard in 0..n−1 that wins the rendezvous for `key`. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1, s"bad nShards $nShards")
    pmod(rendezvousMax(key, nShards), lit(nShards.toLong))
  }

  /**
   * CAPACITY-AWARE rendezvous: shard s wins with probability
   * w_s / Σw (the standard weighted-HRW score `w_s / −ln(u_s)`, with
   * u_s the key-shard fingerprint mapped into (0, 1]) — heterogeneous
   * clusters where a double-capacity node should own double the keys.
   * Keeps every rendezvous property: adding or RE-WEIGHTING one shard
   * moves only keys into/out of that shard, never between bystanders.
   * Scores round to 9 dp before the argmax so a last-ulp `ln`
   * difference between engines can't flip near-ties; exact ties break
   * to the smaller shard id. Same zero-shuffle single-projection shape
   * as [[rendezvousShard]].
   */
  def weightedRendezvousShard(key: Column, weights: Seq[Double]): Column = {
    // weight 0 = drained shard: its score is the LITERAL −1, strictly
    // below anything a live shard can produce — a live shard's tiny
    // positive score can 9dp-ROUND to 0.0, and a drained shard at 0.0
    // would then win the smaller-id tie-break, routing keys to a node
    // declared to have no capacity
    require(weights.exists(_ > 0) && weights.forall(_ >= 0),
      s"bad weights $weights")
    val n = weights.length
    val entries = weights.zipWithIndex.map { case (w, s) =>
      val u = (pmod(TextOps.fingerprint60(
          concat(key.cast("string"), lit(":"), lit(s.toString))),
        lit(2147483648L)) + lit(1L)).cast("double") / lit(2147483649.0)
      val sc = if (w == 0) lit(-1.0) else round(lit(w) / -log(u), 9)
      struct(sc.as("sc"), lit(-s).cast("int").as("ns"))
    }
    (-array_max(array(entries: _*)).getField("ns")).cast("long")
  }

  /**
   * Z-ORDER (Morton) interleave of two bucketized dimensions — the
   * multi-dimensional LAYOUT key: sort/partition 100 TB of parquet by
   * `zOrderKey(custkey_bucket, day_bucket, 16)` and a scan filtered on
   * EITHER dimension prunes most files, where a plain
   * `ORDER BY custkey, day` clusters only the leading column (a
   * date-range scan then touches every file). This is the data-layout
   * primitive behind Delta/Iceberg Z-ordering, as a pure codegen'd
   * column any writer can sort by.
   *
   * Inputs are masked to the low `bits` bits (caller pre-buckets each
   * dimension into 0..2^bits−1; values beyond the mask wrap — bucket
   * first). Bit i of x lands at position 2i, of y at 2i+1, so a prefix
   * of the key (`z >> 2k`) is a 2^(bits−k) × 2^(bits−k) grid cell:
   * every key prefix bounds BOTH dimensions at once.
   *
   * Deterministic and zero-shuffle: a fixed chain of shift/mask/add
   * terms on exact longs — disjoint bit positions make the adds exact,
   * and an engine-independent oracle replays the identical arithmetic.
   */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bad bits $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast(LongType).bitwiseAND(lit(mask))
    val ym = y.cast(LongType).bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
