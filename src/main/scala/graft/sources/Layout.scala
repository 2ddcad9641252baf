package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: multi-dimensional clustering for
  * scan pruning — the lake-layout operator behind `OPTIMIZE ... ZORDER
  * BY` in modern table formats. Bucketing (Bucketing.scala) co-locates
  * ONE key for joins; z-ordering clusters SEVERAL filter columns at
  * once so parquet row-group min/max stats stay tight on each of them,
  * and a filter on any z-column skips most files/row-groups of a
  * 100 TB table instead of scanning it.
  *
  * Mechanics: each column is min/max-scaled to a `bits`-bit integer
  * bucket, the buckets' bits are interleaved into one Morton code, and
  * the frame is range-partitioned + sorted by that code. Rows close in
  * z-code are close in EVERY dimension, so per-file ranges shrink on
  * all columns at once (the locality SpecLayout asserts).
  *
  * Everything is deterministic column arithmetic (no sampling, no
  * RDDs): the z-code of a row is a pure integer function of (value,
  * min, max) per column, replayed exactly by the p15_zorder_code
  * DuckDB oracle. The only nondeterminism in the write path is
  * repartitionByRange's boundary sampling — which moves partition
  * CUTS, never a row's code.
  *
  * Scale notes: the min/max pass is one partial+final agg (tiny
  * result, driver-safe); the write is one range shuffle + local sort —
  * the same cost as any global-sort write. Skewed columns degrade
  * bucket balance (min/max scaling is linear); rank-based bucketing
  * would fix that at the cost of a window sort per column — at 100 TB
  * prefer widening `bits` first.
  */
object Layout {

  /** Interleave the low `bits` bits of each column (little-endian:
    * result bit b·k+c = bit b of column c). All inputs must already
    * lie in [0, 2^bits); k·bits must fit a signed long. Built as a
    * flat bitwise-OR expression tree — codegen folds it into straight
    * shift/and/or instructions, no UDF. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleaveBits needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds a signed long")
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * k + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Min/max-scale `c` into [0, 2^bits): (x−min)·2^bits div
    * (max−min+1) over pure LONG arithmetic (`div` = IntegralDivide —
    * exact, unlike a double divide, for any key span; the +1 keeps
    * x=max inside the top bucket). Constant columns (min=max) map to
    * bucket 0. Nulls map to bucket 0 (they sort first, like a NULLS
    * FIRST layout). */
  def scaleToBucket(c: Column, minV: Long, maxV: Long, bits: Int)
    : Column = {
    require(maxV >= minV, s"max $maxV < min $minV")
    // subtractExact: maxV−minV itself wraps for ranges wider than
    // half the long space (e.g. signed-hash columns), and a wrapped-
    // negative span would sail through the width guard below
    val diff =
      try math.subtractExact(maxV, minV)
      catch {
        case _: ArithmeticException => throw new IllegalArgumentException(
          s"column range [$minV, $maxV] spans more than 2^63 — " +
            "pre-bucket it (e.g. shift to unsigned) before z-ordering")
      }
    require(diff <= (Long.MaxValue >> bits) - 1,
      s"column span ${diff + 1} × 2^$bits overflows a long — lower bits")
    val span = diff + 1L
    coalesce(
      call_function("div",
        (c.cast("long") - lit(minV)) * lit(1L << bits), lit(span)),
      lit(0L))
  }

  /** Z-code column for `df` over integral `cols`: one min/max agg
    * (collected — k×2 longs), then pure per-row arithmetic. */
  def zCode(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zCode needs at least one column")
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"),
      max(col(c)).cast("long")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      require(!mm.isNullAt(2 * i) && !mm.isNullAt(2 * i + 1),
        s"zCode: column $c is entirely null — cannot scale")
      scaleToBucket(col(c), mm.getLong(2 * i), mm.getLong(2 * i + 1), bits)
    }
    interleaveBits(buckets, bits)
  }

  /** Rewrite `df` z-ordered on `cols` into `path` (parquet): range
    * shuffle on the Morton code + in-partition sort, so every output
    * file covers a tight hyper-rectangle of the z-columns. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
    bits: Int = 16, numFiles: Int = 0): Unit = {
    require(!df.columns.contains("_z"),
      "column _z collides with the layout's Morton-code column — " +
        "rename it before rewriting")
    val coded = df.withColumn("_z", zCode(df, cols, bits))
    val ranged =
      if (numFiles > 0) coded.repartitionByRange(numFiles, col("_z"))
      else coded.repartitionByRange(col("_z"))
    ranged.sortWithinPartitions("_z").drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
