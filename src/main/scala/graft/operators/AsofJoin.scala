package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join: for every left row, the single right row with
  * the greatest right-time ≤ left-time (`backward`, the trades↔quotes
  * shape) or the least right-time ≥ left-time (`forward`), per key.
  * The reference has no temporal joins at all — this is north-star
  * coverage for event-stream enrichment (join each event to the most
  * recent state snapshot / price / config at that instant).
  *
  * Implementation is the UNION-SCAN plan, not a range join: tag both
  * sides, union them, and per key take `last(<right payload>, ignore
  * nulls)` over a time-ordered running window, then keep left rows.
  * Cost is ONE shuffle on the key columns and one per-key sort —
  * (|L|+|R|) log-sorted rows, no candidate-pair blowup, no range
  * predicate for the optimizer to mis-plan as a broadcast nested
  * loop. This is the plan that survives 100 TB: both sides stream
  * through their partitions once, and AQE handles a skewed key the
  * same way it would any window.
  *
  * Tie rule: an exactly-equal timestamp MATCHES (≤/≥ inclusive) —
  * the union orders the right row before the left row at equal time,
  * matching DuckDB/pandas ASOF semantics. Right-side duplicates at
  * one (key, time) are the caller's ambiguity to resolve (aggregate
  * first); the window keeps the LAST one in union order.
  */
object AsofJoin {

  /** `backward`: latest right row at-or-before each left row. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
    leftTime: String, rightTime: String): DataFrame =
    asof(left, right, keys, leftTime, rightTime, forward = false)

  /** `forward`: earliest right row at-or-after each left row. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
    leftTime: String, rightTime: String): DataFrame =
    asof(left, right, keys, leftTime, rightTime, forward = true)

  private val Reserved = Set("_t", "_side", "_lp", "_rp", "_m")

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
    leftTime: String, rightTime: String, forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    // the union would silently widen mismatched time types (int vs
    // long, date vs timestamp), quietly changing comparison semantics
    // and the output time column's type — require identical types
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == rt,
      s"as-of time columns must have identical types: $leftTime is " +
        s"${lt.simpleString}, $rightTime is ${rt.simpleString} — cast " +
        "one side before joining")
    val clash = (left.columns ++ right.columns).filter(Reserved).distinct
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with the " +
        s"operator's internal columns (${Reserved.mkString(", ")}) — " +
        "rename before joining")
    val lPayload = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == leftTime)
    val rPayload = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == rightTime)
    require(rPayload.nonEmpty,
      "right side has no payload columns beyond key/time")
    val dup = (lPayload :+ leftTime).intersect(rPayload)
    require(dup.isEmpty, s"ambiguous output columns: $dup")

    def structOf(cols: Seq[String]): Column =
      struct(cols.map(col): _*)
    val lpType = left.select(structOf(
      if (lPayload.nonEmpty) lPayload else Seq(leftTime)))
      .schema.head.dataType
    val rpType = right.select(structOf(rPayload)).schema.head.dataType

    val keyCols = keys.map(col)
    val lSel = left.select(keyCols ++ Seq(
      col(leftTime).as("_t"), lit(1).as("_side"),
      (if (lPayload.nonEmpty) structOf(lPayload)
      else structOf(Seq(leftTime))).as("_lp"),
      lit(null).cast(rpType).as("_rp")): _*)
    // a NULL-time right row can never satisfy ≤/≥ — drop it up front
    // (otherwise nulls-first ordering would hand its payload to left
    // rows with no true match, diverging from SQL ASOF semantics)
    val rSel = right.filter(col(rightTime).isNotNull)
      .select(keyCols ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        lit(null).cast(lpType).as("_lp"),
        structOf(rPayload).as("_rp")): _*)

    // at equal _t the right row (side 0) sorts first in both
    // directions, so an exact-tie right row is visible to the left
    // row. NULL-time LEFT rows sort FIRST in both directions: with
    // null-time right rows already dropped they see no right payload
    // and correctly match nothing (left-join null), while staying in
    // the output.
    val ord =
      if (forward) Seq(col("_t").desc_nulls_first, col("_side").asc)
      else Seq(col("_t").asc_nulls_first, col("_side").asc)
    val w = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSel.unionByName(rSel)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keyCols ++ Seq(col("_t").as(leftTime)) ++
        lPayload.map(c => col(s"_lp.$c").as(c)) ++
        rPayload.map(c => col(s"_m.$c").as(c)): _*)
  }
}
