package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val versions = Seq(
    // key a: changes at v2, stable after
    ("a", 1L, 10.0), ("a", 2L, 11.0), ("a", 3L, 11.0),
    // key b: never changes
    ("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0),
    // key c: appears at v2, changes at v3
    ("c", 2L, 1.0), ("c", 3L, 2.0))
    .toDF("k", "version", "price")

  test("collapses version runs into validity intervals") {
    val out = Scd2.intervals(versions, Seq("k"), "version")
      .select(col("k"), col("from_version"), col("to_version"),
        col("payload.price"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("a", 1L, 1L, 10.0), ("a", 2L, -1L, 11.0),
      ("b", 1L, -1L, 5.0),
      ("c", 2L, 2L, 1.0), ("c", 3L, -1L, 2.0)))
  }

  test("null payloads compare null-safely (no phantom change)") {
    val df = Seq(
      ("x", 1L, Option.empty[Double]), ("x", 2L, Option.empty[Double]),
      ("x", 3L, Some(1.0)))
      .toDF("k", "version", "price")
    val out = Scd2.intervals(df, Seq("k"), "version")
      .select("from_version").collect().map(_.getLong(0)).sorted
    // null -> null is NOT a change; null -> 1.0 is
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("the whole chain runs on ONE shuffle") {
    val plan = Scd2.intervals(versions, Seq("k"), "version")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly 1 hash exchange, found $exchanges:\n$plan")
  }
}
