package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-cardinality sketch — the
  * cardinality face of the sketch family (CmsSketch is the frequency
  * face). Hash every key to a uniform 60-bit integer, keep the k
  * smallest DISTINCT hashes; if the kth smallest is `h_k`, the keys
  * are ≈ uniformly spaced M/n apart, so n ≈ (k−1)·M / h_k (the
  * classic KMV estimator, relative error ~1/√(k−2)).
  *
  * Like every sketch here, the hash is StableHash.md5Mod — no seed,
  * no RNG — so the estimate is bit-identical across engines and
  * stage retries, and the DuckDB oracle replays it exactly.
  *
  * Scale: the plan is a map-side partial DISTINCT on 8-byte hashes
  * (the shuffle carries distinct hashes only), then a global
  * TakeOrdered(k) — per-partition top-k, merged on the driver as k
  * longs. No full sort, no wide state.
  */
object KmvSketch {

  /** Hash domain: [0, 2^60) — the full width of StableHash's 15 hex
    * chars, BIGINT-safe in every engine. */
  val M: Long = 1L << 60

  /** One-row frame: (est_distinct, k_seen). Fewer than k distinct
    * hashes means the sketch IS the distinct set — exact count. */
  def distinctEstimate(df: DataFrame, keyCol: String, k: Int)
    : DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val kMin = df
      .select(StableHash.md5Mod("kmv", col(keyCol), M).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
    kMin.agg(count(lit(1)).as("seen"), max("h").as("kth"))
      .select(
        when(col("seen") < k, col("seen"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(M.toDouble) /
            greatest(col("kth"), lit(1L)).cast("double") + lit(0.5d))
            .cast("long"))
          .as("est_distinct"),
        col("seen").cast("long").as("k_seen"))
  }
}
