package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition seeded RNG: the selected
  * set changes whenever partitioning changes (repartition, AQE,
  * cluster resize) and a stage retry can re-draw a partition — the
  * same silent-wrong-answer class as a nondeterministic shuffle key.
  * Hash sampling decides per ROW CONTENT: `u(key) < rate` where
  * `u` is a uniform integer derived from md5 of the key (plus an
  * optional salt that selects a different-but-still-deterministic
  * sample). Reproducible across runs, engines, partitionings, and
  * retries; subset-monotone (the 1% sample is contained in the 10%
  * sample); and expressible identically in any md5-capable oracle.
  *
  * At 100 TB this is a narrow codegen'd filter pushed at the scan —
  * no shuffle, no state, no driver involvement.
  */
object Sampling {

  /** Scale of the acceptance threshold: hash-derived uniform is an
    * integer in [0, 1e6) — rates are exact at ppm granularity. */
  val Granularity = 1000000L

  /** Uniform integer in [0, Granularity) from the key's md5
    * (StableHash.md5Mod with the salt as prefix). */
  def uniform(key: Column, salt: String): Column =
    StableHash.md5Mod(salt, key, Granularity)

  /** A NULL key has no content to hash: md5(null) is null, the
    * comparison is null, and the filter would drop the row SILENTLY —
    * even at rate 1.0, violating "rate 1 keeps everything". Sampling
    * decisions must be explicit, so a null key fails loudly instead;
    * filter nulls (or coalesce to a sentinel) before sampling. */
  private def checkedUniform(key: Column, salt: String): Column =
    when(key.isNull, raise_error(lit(
      "Sampling: null key — hash sampling requires non-null keys " +
        "(filter or coalesce them first)")))
      .otherwise(uniform(key, salt))

  /** Keep rows whose key hashes under `rate`. Null keys throw — see
    * `checkedUniform`. */
  def byHash(df: DataFrame, keyCol: String, rate: Double,
    salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    df.filter(checkedUniform(col(keyCol), salt) <
      lit(math.round(rate * Granularity)))
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-Res): each row gets priority u^(1/w)
    * with u uniform — the k highest priorities are a weighted
    * sample. Here u derives from the key's md5 over a 2^60 domain
    * (no RNG), and the rank key is the monotone-equivalent
    * ln(u)/w, quantized e9. Every arithmetic step after ln is an
    * IEEE-specified operation (division by a power of two, one
    * correctly-rounded divide and multiply) — but ln itself is NOT
    * IEEE-required to be correctly rounded, so this carries the
    * same accepted quantize-at-the-transcendental risk as the
    * x13/x15 contract: a 1-ulp libm divergence landing exactly on a
    * floor(x·1e9 + 0.5) boundary could flip one priority and swap
    * k-boundary membership on another engine (never observed across
    * JVM/DuckDB on this family's inputs, and within one engine the
    * result is fully deterministic). Ties (only possible at equal quantized
    * priority) break by key.
    *
    * Plan: narrow priority map + TakeOrdered(k) — per-partition
    * heaps, no global sort; retry/partitioning-invariant because
    * nothing is random. Weights must be positive. */
  def weightedPriority(df: DataFrame, keyCol: String,
    weightCol: String, k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val m = 1L << 60
    val u = (StableHash.md5Mod(salt, col(keyCol), m) + lit(1L))
      .cast("double") / lit(m.toDouble)
    val guardedW = when(col(weightCol).isNull || col(weightCol) <= 0,
      raise_error(lit("Sampling: weights must be positive non-null")))
      .otherwise(col(weightCol))
    df.withColumn("pri_e9",
      floor(log(u) / guardedW * lit(1e9) + lit(0.5d)).cast("long"))
      .orderBy(col("pri_e9").desc, col(keyCol))
      .limit(k)
  }

  /** Per-stratum rates (class-balanced downsampling): rows whose
    * stratum is absent from `rates` are DROPPED — an explicit mix
    * spec, not a passthrough. Null keys throw — see `checkedUniform`. */
  def stratifiedByHash(df: DataFrame, keyCol: String, strataCol: String,
    rates: Map[String, Double], salt: String = ""): DataFrame = {
    rates.values.foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0,1]"))
    val threshold = rates.foldLeft(lit(-1L)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k),
        lit(math.round(r * Granularity))).otherwise(acc)
    }
    df.filter(checkedUniform(col(keyCol), salt) < threshold)
  }

  /** Per-group keep thresholds for √-temperature source mixing
    * (α = 0.5 in the p_s ∝ N_s^α mixing family): each group keeps
    * `floor(Granularity · sqrt(N_min / N_g))` ppm, so the EXPECTED
    * kept count is √(N_min·N_g) — large sources are flattened toward
    * the smallest one without equalizing outright (α = 0 would be
    * uniform, α = 1 the natural mix). α is pinned to 0.5 because
    * `sqrt` is IEEE-correctly-rounded in every engine while `pow(x,
    * α)` is not — the thresholds replay bit-identically in any
    * oracle; other temperatures = compute rates outside and use
    * `stratifiedByHash`. Output: (groupCol, n_rows, keep_e6), one
    * row per group. */
  def temperatureThresholds(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"))
    // global min rides in as a 1-row cross join (Catalyst broadcasts
    // a single-row side on its own — no forced hint needed)
    val nMin = counts.agg(min(col("n_rows")).as("n_min"))
    counts.crossJoin(nMin)
      .select(col(groupCol), col("n_rows"),
        floor(lit(Granularity) *
          sqrt(col("n_min").cast("double") / col("n_rows").cast("double")))
          .cast("long").as("keep_e6"))
  }

  /** √-temperature mix applied: keep rows whose key hashes under the
    * group's threshold. The threshold side has one row per group
    * (source/language cardinality — small by construction); the join
    * back is size-gated broadcast via AQE, the filter itself is the
    * same narrow content-hash predicate as `byHash`. Null keys throw
    * — see `checkedUniform`. */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
    salt: String = "temp"): DataFrame =
    temperatureMix(df, keyCol, groupCol,
      temperatureThresholds(df, groupCol), salt)

  /** As above with PRECOMPUTED thresholds (a `temperatureThresholds`
    * frame, or any (groupCol, keep_e6) frame) — callers that also
    * report the thresholds pass them here so the corpus is aggregated
    * once, not once per use. */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
    thresholds: DataFrame, salt: String): DataFrame =
    // null GROUPS throw like null keys: the inner equi-join would
    // silently drop every null-group row while temperatureThresholds
    // still reports a threshold for that group — sampling decisions
    // must be explicit, never an artifact of null-rejecting equality
    df.withColumn(groupCol,
      when(col(groupCol).isNull, raise_error(lit(
        "Sampling: null group — temperature mixing requires non-null " +
          "groups (filter or coalesce them first)")))
        .otherwise(col(groupCol)))
      .join(thresholds.select(col(groupCol), col("keep_e6")), Seq(groupCol))
      .filter(checkedUniform(col(keyCol), salt) < col("keep_e6"))
      .drop("keep_e6")
}
