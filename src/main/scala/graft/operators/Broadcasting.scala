package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast: the middle ground between a forced
  * `broadcast()` hint (honored REGARDLESS of size — an outgrown
  * dimension OOMs the driver) and no hint (fine once AQE has runtime
  * stats, but the initial plan relies on Catalyst's estimate, which
  * parquet/JSON scans without collected stats often overestimate).
  *
  * `maybeBroadcast` applies the hint only when Catalyst's own
  * estimate for the optimized plan is under `maxBytes` — so a
  * dimension that quietly grew past the threshold degrades to a
  * shuffle join instead of failing, while the common small case
  * keeps the single-pass broadcast plan. Use for dimensions whose
  * size tracks the corpus (slide→hash lookups); skip for frames
  * bounded by construction (a 25-row nation table, 8 hyperplanes, a
  * localized centroid set), where the plain hint is already safe.
  */
object Broadcasting {

  /** Default cap matches Spark's autoBroadcastJoinThreshold default. */
  val DefaultMaxBytes: Long = 10L << 20

  def maybeBroadcast(df: DataFrame,
    maxBytes: Long = DefaultMaxBytes): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) broadcast(df) else df
  }
}
