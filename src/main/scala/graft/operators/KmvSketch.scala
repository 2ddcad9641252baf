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
    val kMin = sketch(df, keyCol, k)
    kMin.agg(count(lit(1)).as("seen"), max("h").as("kth"))
      .select(
        when(col("seen") < k, col("seen"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(M.toDouble) /
            greatest(col("kth"), lit(1L)).cast("double") + lit(0.5d))
            .cast("long"))
          .as("est_distinct"),
        col("seen").cast("long").as("k_seen"))
  }

  /** The sketch itself: the k smallest distinct hashes, one `h` row
    * each. ≤ k rows — cheap to store per segment (day, source,
    * shard) and to combine later with [[setOps]]. */
  def sketch(df: DataFrame, keyCol: String, k: Int): DataFrame =
    // NULL keys are NOT COUNTED (the CmsSketch family contract): a
    // null hashes to a null h, which sorts FIRST under the ascending
    // order and would occupy a k-minimum slot — silently skewing
    // every estimate built on the sketch
    df.filter(col(keyCol).isNotNull)
      .select(StableHash.md5Mod("kmv", col(keyCol), M).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)

  /** Union / intersection cardinality from two sketches — the point
    * of storing KMV per segment: |A∪B| and |A∩B| for ANY segment
    * pair from 2·k stored longs, no corpus rescan. The union sketch
    * is the k smallest of the merged hash sets (closed under union);
    * the intersection uses the ratio estimator ρ = |K_∪ ∩ K_A ∩
    * K_B| / |K_∪| (Beyer et al., 2007), so est_inter =
    * round(ρ · est_union).
    *
    * Exactness contract (oracle parity): k must be a power of two —
    * then the only two float divisions are by `kth` (shared IEEE
    * spelling on both sides) and by `seen`, which is either k (a
    * power of two — exact binary division) or small enough that the
    * quotient is the exactly-representable n_both. When the merged
    * sketch holds fewer than k hashes it IS the union hash set and
    * both outputs are exact counts. */
  def setOps(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
    k: Int): DataFrame = {
    require(k >= 2 && Integer.bitCount(k) == 1,
      s"setOps needs a power-of-two k for exact cross-engine " +
        s"arithmetic, got $k")
    // side-tagged union instead of semi-joins back to ka/kb: each
    // sketch is derived ONCE in the plan (a semi-join spelling
    // re-scans both sources), and the merge is a 2k-row aggregate
    val tagged = sketch(a, aKey, k)
      .select(col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .union(sketch(b, bKey, k)
        .select(col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
    val u = tagged.groupBy(col("h"))
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .orderBy(col("h")).limit(k)
    u.agg(count(lit(1)).as("seen"), max("h").as("kth"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("seen"), col("n_both"),
        when(col("seen") < k, col("seen"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(M.toDouble) /
            greatest(col("kth"), lit(1L)).cast("double") + lit(0.5d))
            .cast("long"))
          .as("est_union"))
      .select(
        col("est_union"),
        floor(col("n_both").cast("double") * col("est_union") /
          greatest(col("seen"), lit(1L)).cast("double") + lit(0.5d))
          .cast("long").as("est_inter"),
        col("n_both").cast("long").as("k_both"),
        col("seen").cast("long").as("union_seen"))
  }
}
