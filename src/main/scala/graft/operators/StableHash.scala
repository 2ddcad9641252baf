package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE cross-engine stable hash: first 15 hex chars (60 bits —
  * BIGINT-safe in every engine) of `md5("<prefix>:<key>")`, as a
  * non-negative int64 mod `modulus`. Deterministic by construction
  * (no seed, no RNG, no partition dependence), so results survive
  * stage retries and reproduce bit-identically in any md5-capable
  * oracle — DuckDB spells the same arithmetic
  * `('0x' || substr(md5(p || ':' || k), 1, 15))::BIGINT % m`.
  *
  * This is the single definition the parity-critical operators
  * (CmsSketch buckets, Sampling thresholds) derive from; change it
  * only in lockstep with every oracle that replays it.
  */
object StableHash {
  def md5Mod(prefix: String, key: Column, modulus: Long): Column =
    pmod(conv(substring(md5(concat(lit(prefix), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(modulus))
}
