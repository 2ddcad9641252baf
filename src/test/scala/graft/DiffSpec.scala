package graft

import graft.operators.Diff
import org.apache.spark.sql.functions._

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  private val oldDf = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "price")

  test("classifies added/removed/changed/unchanged") {
    val newDf = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "b", 99.0),   // changed (price)
      (4L, "x", 40.0),   // changed (name)
      (5L, "e", 50.0))   // added; key 3 removed
      .toDF("k", "name", "price")
    val out = Diff.snapshot(oldDf, newDf, Seq("k"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "changed", 5L -> "added"))
    val sum = Diff.summary(oldDf, newDf, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(sum == Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("null keys match null-safely instead of splitting add+remove") {
    val a = Seq((Option.empty[Long], "x"), (Some(1L), "y"))
      .toDF("k", "v")
    val b = Seq((Option.empty[Long], "x"), (Some(1L), "z"))
      .toDF("k", "v")
    val out = Diff.snapshot(a, b, Seq("k"))
      .select("k", "status").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        r.getString(1)).toMap
    assert(out == Map(-1L -> "unchanged", 1L -> "changed"))
  }

  test("null payloads compare null-safely") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "v")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val out = Diff.snapshot(a, b, Seq("k"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("payload structs ride along for changed-row inspection") {
    val newDf = oldDf.withColumn("price",
      when(col("k") === 2, 99.0).otherwise(col("price")))
    val changed = Diff.snapshot(oldDf, newDf, Seq("k"))
      .filter(col("status") === "changed")
      .select(col("k"), col("old_payload.price"),
        col("new_payload.price")).collect()
    assert(changed.length == 1)
    assert(changed.head.getDouble(1) == 20.0)
    assert(changed.head.getDouble(2) == 99.0)
  }

  test("toChangelog + maintain refreshes a summary to the new snapshot") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("price_e2"))
    val is5 = pmod(col("o_orderkey"), lit(5)) === 0
    val is7 = pmod(col("o_orderkey"), lit(7)) === 0 && !is5
    val v2 = orders.filter(!is7)
      .withColumn("price_e2",
        when(is5, col("price_e2") + 1L).otherwise(col("price_e2")))
    val summary = graft.operators.IncrementalAgg.aggregate(orders,
      Seq("o_orderstatus"), Seq("price_e2"))
    val maintained = graft.operators.IncrementalAgg.maintain(summary,
      Diff.toChangelog(orders, v2, Seq("o_orderkey")),
      Seq("o_orderstatus"), Seq("price_e2"))
    val direct = graft.operators.IncrementalAgg.aggregate(v2,
      Seq("o_orderstatus"), Seq("price_e2"))
    assert(maintained.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("toChangelog is diff-sized: removed + added + 2*changed rows") {
    val newDf = oldDf
      .filter(col("k") =!= 1)                              // remove 1
      .withColumn("price",
        when(col("k") === 2, 99.0).otherwise(col("price"))) // change 2
      .unionByName(Seq((5L, "e", 50.0)).toDF("k", "name", "price"))
    val log = Diff.toChangelog(oldDf, newDf, Seq("k"))
    assert(log.count() == 4) // -1(k=1), -1/+1(k=2), +1(k=5)
    val ops = log.select("k", "_op").as[(Long, Long)].collect().toSet
    assert(ops == Set((1L, -1L), (2L, -1L), (2L, 1L), (5L, 1L)))
  }

  test("mismatched schemas and key-only frames are rejected") {
    intercept[IllegalArgumentException](
      Diff.snapshot(oldDf, oldDf.drop("price"), Seq("k")))
    intercept[IllegalArgumentException](
      Diff.snapshot(oldDf.select("k"), oldDf.select("k"), Seq("k")))
  }
}
