package graft

import graft.plans.GroupedTopK
import org.apache.spark.sql.functions._

/** Pruning/pushdown across the custom GroupedTopKPlan boundary —
  * Catalyst stops at unknown nodes, so without the companion rule a
  * narrow select above the operator still scans every column and a
  * group filter runs after the heaps. */
class GroupedTopKPushdownSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("narrow select above topK prunes the scan to the used columns") {
    val wide = Tables.load(spark, sf, "lineitem") // 11 columns
    val df = GroupedTopK.topK(wide, Seq("l_returnflag"), "l_orderkey", 2)
      .select("l_returnflag", "l_orderkey")
    val p = df.queryExecution.executedPlan.toString
    // the parquet scan must read only group + order columns
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_orderkey"),
      read)
    assert(!read.contains("l_extendedprice") && !read.contains("l_shipdate"),
      s"scan not pruned: $read")
    assert(df.count() == 6) // 3 flags x top-2
  }

  test("extra payload columns survive pruning when selected") {
    val wide = Tables.load(spark, sf, "lineitem")
    val df = GroupedTopK.topK(wide, Seq("l_returnflag"), "l_orderkey", 1)
      .select("l_returnflag", "l_orderkey", "l_quantity")
    val read = "ReadSchema: [^\\n]*".r
      .findFirstIn(df.queryExecution.executedPlan.toString).getOrElse("")
    assert(read.contains("l_quantity"), read)
    assert(!read.contains("l_extendedprice"), read)
  }

  test("group-key filters slide below the heaps; results unchanged") {
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"))
    val df = GroupedTopK.topK(base, Seq("o_orderpriority"),
        "o_orderkey", 3)
      .filter(col("o_orderpriority") === "1-URGENT")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the Filter must sit UNDER the topk node in the optimized plan
    val topkIdx = optimized.indexOf("GroupedTopK")
    val filterIdx = optimized.indexOf("Filter")
    assert(topkIdx >= 0 && filterIdx > topkIdx,
      s"filter not pushed below:\n$optimized")
    import org.apache.spark.sql.expressions.Window
    val ref = base.withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderkey").desc)))
      .filter(col("rn") <= 3 &&
        col("o_orderpriority") === "1-URGENT")
      .select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toSet
    assert(df.select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toSet == ref)
  }

  test("non-group filters stay ABOVE (they don't commute with top-k)") {
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"))
    val df = GroupedTopK.topK(base, Seq("o_orderpriority"),
        "o_orderkey", 3)
      .filter(col("o_orderkey") % 2 === 0)
    val optimized = df.queryExecution.optimizedPlan.toString
    val topkIdx = optimized.indexOf("GroupedTopK")
    val filterIdx = optimized.indexOf("Filter")
    assert(filterIdx >= 0 && filterIdx < topkIdx,
      s"order-column filter must not push below:\n$optimized")
    // correctness: top-3 FIRST, then parity filter — NOT top-3 of
    // the even subset
    import org.apache.spark.sql.expressions.Window
    val ref = base.withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderkey").desc)))
      .filter(col("rn") <= 3 && col("o_orderkey") % 2 === 0)
      .select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toSet
    assert(df.select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toSet == ref)
  }

  test("mixed conjunction splits: group part below, payload part above") {
    val base = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"))
    val df = GroupedTopK.topK(base, Seq("o_orderpriority"),
        "o_orderkey", 2)
      .filter(col("o_orderpriority") =!= "1-URGENT" &&
        col("o_orderkey") % 2 === 0)
    val optimized = df.queryExecution.optimizedPlan.toString
    val topkIdx = optimized.indexOf("GroupedTopK")
    assert(optimized.substring(0, topkIdx).contains("Filter"),
      s"payload conjunct not above:\n$optimized")
    assert(optimized.substring(topkIdx).contains("Filter"),
      s"group conjunct not below:\n$optimized")
    import org.apache.spark.sql.expressions.Window
    val ref = base.withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderkey").desc)))
      .filter(col("rn") <= 2 &&
        col("o_orderpriority") =!= "1-URGENT" &&
        col("o_orderkey") % 2 === 0)
      .select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toSet
    assert(df.select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toSet == ref)
  }
}
