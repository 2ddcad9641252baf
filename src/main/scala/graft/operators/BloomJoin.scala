package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContain

/** Bloom-filter pre-filtered semi/anti join: the standard 100 TB
  * pattern for "big fact ⋉ filtered dimension" when the dimension's
  * key set is too large to broadcast as a hash join but its BITS fit
  * anywhere (a 10M-key set is a ~17 MB bloom at 1% fpp — vs hundreds
  * of MB as a broadcast hash relation). The filter prunes the fact
  * side IN THE SCAN STAGE, before the join shuffle: only candidate
  * rows (true matches + fpp·|non-matches|) pay shuffle cost, while a
  * plain shuffle semi join moves every fact row.
  *
  * Results are EXACT: the bloom only prunes; an exact `left_semi`
  * (or `left_anti`) join on the survivors removes false positives.
  * The anti variant prunes with the INVERSE property (a key whose
  * bits are not all set is definitely absent → definitely in the
  * anti result) and only joins the candidates.
  *
  * Determinism: bits come from two xxhash64 evaluations per key
  * (Kirsch–Mitzenmacher double hashing, bit_j = h1 + j·h2 mod m) —
  * content hashes, no seed/partition/retry dependence, same contract
  * as StableHash (md5 is not needed here because no oracle replays
  * the filter: correctness rests on the exact join, so the cheaper
  * hash wins on the hot path).
  *
  * The build is distributed: per-partition partial bitmaps never
  * leave the executors — keys map to (word, mask) pairs, a partial
  * `bit_or` combines map-side, and at most `numBits/64` word rows
  * reach the driver (512 KiB at the 4M-bit default), independent of
  * key count.
  */
object BloomJoin {

  /** 4M bits = 512 KiB: <1% fpp up to ~500k keys at 4 hashes. */
  val DefaultNumBits: Int = 1 << 22
  val DefaultNumHashes: Int = 4

  /** Immutable bit array + its probe parameters. */
  final case class Bloom(words: Array[Long], numHashes: Int) {
    def numBits: Int = words.length * 64
  }

  private def checkParams(numBits: Int, numHashes: Int): Unit = {
    require(numBits >= 64 && (numBits & 63) == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
  }

  /** Bit positions of `key`: (h1 + j*h2) mod numBits for j < k, via
    * two xxhash64 runs (second salted). Both hashes are reduced mod
    * numBits BEFORE the linear combination — identical bits (mod
    * distributes), and j·h2 then tops out near 2^35, so the ANSI-mode
    * int64 arithmetic can never overflow the way raw ±2^63 hash
    * values would. pmod keeps positions non-negative. */
  private def bitCols(key: Column, numBits: Int, numHashes: Int)
    : Seq[Column] = {
    val m = lit(numBits.toLong)
    val h1 = pmod(xxhash64(key), m)
    val h2 = pmod(xxhash64(lit("graft_bloom"), key), m)
    (0 until numHashes).map(j => pmod(h1 + lit(j.toLong) * h2, m))
  }

  /** Build a bloom over `df(keyCol)` distributively. Null keys set no
    * bits (they can never equi-join anyway). */
  def build(df: DataFrame, keyCol: String,
    numBits: Int = DefaultNumBits,
    numHashes: Int = DefaultNumHashes): Bloom = {
    checkParams(numBits, numHashes)
    val bits = bitCols(col(keyCol), numBits, numHashes)
    val wordMasks = df.filter(col(keyCol).isNotNull)
      .select(explode(array(bits: _*)).as("bit"))
      .select((col("bit") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L),
          (col("bit") % 64).cast("int")).as("mask"))
      .groupBy(col("word")).agg(bit_or(col("mask")).as("mask"))
      .collect() // ≤ numBits/64 rows by construction — driver-safe
    val words = new Array[Long](numBits / 64)
    wordMasks.foreach(r => words(r.getInt(0)) |= r.getLong(1))
    Bloom(words, numHashes)
  }

  /** Membership test column: all `numHashes` bits set — a native
    * codegen'd probe (`BloomMightContain`) over the same two xxhash64
    * values the build hashed with. The word array rides as a plain
    * JVM field (one primitive block per task binary), never as an
    * array literal in the expression tree: the literal spelling cost
    * seconds of optimizer hashing + per-task boxed deserialization at
    * the 4M-bit default. No join, no shuffle, evaluated right on top
    * of the scan. */
  def mightContain(bloom: Bloom, key: Column): Column = {
    val h1 = GraftShims.expression(xxhash64(key))
    val h2 = GraftShims.expression(xxhash64(lit("graft_bloom"), key))
    GraftShims.column(
      BloomMightContain(h1, h2, bloom.words, bloom.numHashes))
  }

  /** Exact semi join with bloom pre-pruning: `big ⋉ small` on
    * bigKey = smallKey. The bloom eliminates most non-matching big
    * rows before the shuffle; the semi join removes false positives. */
  def semiJoin(big: DataFrame, small: DataFrame,
    bigKey: String, smallKey: String,
    numBits: Int = DefaultNumBits,
    numHashes: Int = DefaultNumHashes): DataFrame = {
    val bloom = build(small, smallKey, numBits, numHashes)
    val pruned = big.filter(mightContain(bloom, col(bigKey)))
    pruned.join(small, pruned(bigKey) === small(smallKey), "left_semi")
  }

  /** Exact anti join with bloom short-circuit: rows whose key is
    * definitely absent (bloom says no) pass straight through with NO
    * join at all; only bloom candidates are checked exactly. */
  def antiJoin(big: DataFrame, small: DataFrame,
    bigKey: String, smallKey: String,
    numBits: Int = DefaultNumBits,
    numHashes: Int = DefaultNumHashes): DataFrame = {
    val bloom = build(small, smallKey, numBits, numHashes)
    // NULL AND FALSE = FALSE, so a null big key is never a candidate
    // and lands in definiteMiss — correct: null equi-joins nothing,
    // so anti keeps it
    val candidate = mightContain(bloom, col(bigKey)) &&
      col(bigKey).isNotNull
    val definiteMiss = big.filter(!candidate)
    val checked = big.filter(candidate)
    val anti = checked.join(small,
      checked(bigKey) === small(smallKey), "left_anti")
    definiteMiss.unionByName(anti)
  }
}
