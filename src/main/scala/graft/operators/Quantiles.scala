package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles, distributed: the rank-and-interpolate
  * definition (linear interpolation at rank (n−1)·p, the same contract
  * as NumPy's default / SQL's percentile_cont), computed with a
  * window sort instead of Spark's built-in `percentile` aggregate.
  *
  * Why not `percentile`: that aggregate BUFFERS every group value in
  * an in-memory map (ObjectHashAggregate) — a corpus-sized group OOMs
  * an executor at 100 TB. A window sort ranks the same rows through
  * Spark's external (spilling) sorter, so group size is bounded by
  * disk, not heap. One sort shuffle + one map-side-combinable
  * aggregation; only the two rank-adjacent rows per (group, p) survive
  * the filter into the final aggregation.
  *
  * Numeric contract: target rank (n−1)·p and the interpolation
  * v_lo + frac·(v_hi − v_lo) are evaluated in IEEE double exactly as
  * written, so an oracle replaying the same formula hash-matches
  * (with quarter fractions and integer-valued inputs the arithmetic
  * is exact, not merely reproducible).
  */
object Quantiles {

  /** One row per group: `<name>_e<k>` integer-scaled quantile columns
    * (half-up at 10^scaleDigits) for each (name, p) in `ps`, e.g.
    * ("p25", 0.25). Null values are excluded from ranks (SQL
    * percentile_cont semantics); empty groups vanish with them. */
  def perGroup(df: DataFrame, groupCol: String, valCol: String,
    ps: Seq[(String, Double)], scaleDigits: Int = 2): DataFrame = {
    require(ps.nonEmpty, "perGroup needs at least one quantile")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"quantile $n=$p outside [0,1]") }
    require(scaleDigits >= 0 && scaleDigits <= 9,
      s"scaleDigits must be in [0,9], got $scaleDigits")
    val mul = math.pow(10, scaleDigits)
    val rows = df.select(col(groupCol), col(valCol))
      .filter(col(valCol).isNotNull)
    val ranked = rows
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valCol))))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
    // Keep only rows adjacent to some requested rank: ranks are data-
    // independent functions of (_n, p), so this filter drops all but
    // O(|ps|) rows per group before the shuffle to the final agg.
    val needed = ps.map { case (_, p) =>
      val lo = floor((col("_n") - 1) * p) + 1
      col("_rn") === lo || col("_rn") === lo + 1
    }.reduce(_ || _)
    val qs = ps.map { case (name, p) =>
      // per-row rank bound (row-level _n, evaluated before the agg)
      val lo = floor((col("_n") - 1) * p) + 1  // 1-based lower rank
      val vLo = max(when(col("_rn") === lo, col(valCol))).cast("double")
      val vHi = max(when(col("_rn") === lo + 1, col(valCol)))
        .cast("double")
      // group-level fraction: _n is constant per group, so max(_n)
      // recovers it on the agg side
      val idx = (max(col("_n")) - 1) * p       // fractional target rank
      val frac = idx - floor(idx)
      val v = when(vHi.isNull || lit(p) === 1.0, vLo)
        .otherwise(vLo + frac * (vHi - vLo))
      floor(v * mul + 0.5).cast("long").as(s"${name}_e$scaleDigits")
    }
    ranked.filter(needed)
      .groupBy(col(groupCol))
      .agg(qs.head, qs.tail: _*)
  }

  /** SCALE-PATH bucketing (the production spelling x14's ntile census
    * documents): nBuckets−1 approximate cut points from ONE
    * distributed t-digest aggregation (`percentile_approx` — partial-
    * combinable, bounded memory), broadcast as a single row, then
    * every row binned MAP-SIDE by counting cut points below its
    * value. No global sort, no single-partition window — the whole
    * plan is one tiny agg + a narrow projection, so it costs the same
    * at 100 TB as at 100 MB (one corpus scan).
    *
    * Semantics vs ntile: ties land together in the LOWER bucket
    * (value == cut point stays below), so bucket populations are
    * equal only up to tie mass and t-digest error — the right trade
    * for curriculum binning, where boundary exactness is meaningless.
    * Returns `df` + `bucket` (1-based long). */
  def assignBuckets(df: DataFrame, valCol: String, nBuckets: Int,
    accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(!df.columns.contains("bucket"),
      "column 'bucket' collides with the output column")
    require(!df.columns.contains("_cuts"),
      "column '_cuts' collides with the internal cut-point column")
    require(valCol != "_qcut_v",
      "column '_qcut_v' collides with the internal lambda variable")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = df
      .agg(percentile_approx(col(valCol).cast("double"),
        typedLit(probs), lit(accuracy)).as("_cuts"))
    // backtick-quote the interpolated column (`` escapes a literal
    // backtick) so odd names parse and can never be captured by the
    // lambda parameter
    val quoted = "`" + valCol.replace("`", "``") + "`"
    df.crossJoin(broadcast(cuts)) // 1 row: a free broadcast NLJ
      .withColumn("bucket", expr(
        s"""1L + size(filter(_cuts,
           |  _qcut_v -> _qcut_v < cast($quoted as double)))"""
          .stripMargin)
        .cast("long"))
      .drop("_cuts")
  }
}
