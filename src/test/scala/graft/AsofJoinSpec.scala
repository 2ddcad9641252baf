package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "qt", "px")

  private val trades = Seq(
    ("A", 5L, 100), // before any quote → null
    ("A", 10L, 101), // exact tie → matches qt=10
    ("A", 25L, 102), // between → qt=20
    ("A", 99L, 103), // after all → qt=30
    ("B", 14L, 104), // before B's only quote → null
    ("C", 50L, 105)) // key with no right rows → null
    .toDF("sym", "tt", "qty")

  test("backward: latest right row at-or-before, nulls when none") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tt", "qt")
      .select("sym", "tt", "qty", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out == Set(
      ("A", 5L, None), ("A", 10L, Some(1.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 14L, None), ("C", 50L, None)))
  }

  test("forward: earliest right row at-or-after") {
    val out = AsofJoin.forward(trades, quotes, Seq("sym"), "tt", "qt")
      .select("sym", "tt", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set(
      ("A", 5L, Some(1.0)), ("A", 10L, Some(1.0)), ("A", 25L, Some(3.0)),
      ("A", 99L, None), ("B", 14L, Some(9.0)), ("C", 50L, None)))
  }

  test("left payload columns survive and row count is exactly |L|") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tt", "qt")
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("sym", "tt", "qty", "px"))
    assert(out.filter(col("qty") === 102).select("px").as[Double]
      .head() == 2.0)
  }

  test("plan shape: one shuffle on the key, no nested-loop join") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "tt", "qt")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // union-scan: a Window over the union, not a join operator at all
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("guards: missing key and colliding payload names throw") {
    intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, quotes, Nil, "tt", "qt")
    }
    val clash = quotes.withColumnRenamed("px", "qty")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, clash, Seq("sym"), "tt", "qt")
    }
    // right payload named like the LEFT time column would emit two
    // "tt" columns — must throw, not produce a duplicate
    val timeClash = quotes.withColumnRenamed("px", "tt")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, timeClash, Seq("sym"), "tt", "qt")
    }
    // reserved internal names are rejected up front
    val reserved = trades.withColumnRenamed("qty", "_t")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(reserved, quotes, Seq("sym"), "tt", "qt")
    }
  }

  test("mismatched time-column types are rejected, not silently coerced") {
    val t = Seq(("A", 5, 100)).toDF("sym", "tt", "qty") // int time
    val q = Seq(("A", 4L, 1.5)).toDF("sym", "qt", "px") // long time
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(t, q, Seq("sym"), "tt", "qt")
    }
    assert(e.getMessage.contains("identical types"), e.getMessage)
    // identical types still join fine
    val ok = AsofJoin.backward(
      t.withColumn("tt", $"tt".cast("long")), q, Seq("sym"), "tt", "qt")
    assert(ok.select("px").collect().head.getDouble(0) == 1.5)
  }

  test("null timestamps match nothing, matching SQL ASOF semantics") {
    val q = Seq(("A", Option.empty[Long], 7.0),
      ("A", Some(20L), 2.0)).toDF("sym", "qt", "px")
    val t = Seq(("A", Some(5L), 100), ("A", Some(25L), 101),
      ("A", Option.empty[Long], 102)).toDF("sym", "tt", "qty")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("qty", "px").collect()
        .map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val back = run(AsofJoin.backward(t, q, Seq("sym"), "tt", "qt"))
    // t=5: no quote at-or-before (the null-time quote must NOT leak
    // in); t=25: qt=20; null-time trade: no match, row preserved
    assert(back == Map(100 -> None, 101 -> Some(2.0), 102 -> None))
    val fwd = run(AsofJoin.forward(t, q, Seq("sym"), "tt", "qt"))
    assert(fwd == Map(100 -> Some(2.0), 101 -> None, 102 -> None))
  }
}
