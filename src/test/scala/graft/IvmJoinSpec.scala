package graft

import graft.operators.{IncrementalAgg, IvmJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IvmJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val viewCols = Seq("a", "ck", "b")

  /** Maintained view vs the direct join of the post-delta states. */
  private def check(oldA: DataFrame, delA: DataFrame, insA: DataFrame,
    oldB: DataFrame, delB: DataFrame, insB: DataFrame): Unit = {
    val dA = IncrementalAgg.signedDelta(delA, insA)
    val dB = IncrementalAgg.signedDelta(delB, insB)
    val maintained = IvmJoin.applyDelta(
      oldA.join(oldB, "ck"),
      IvmJoin.viewDelta(oldA, dA, oldB, dB, "ck"), viewCols)
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    val newA = oldA.exceptAll(delA).unionByName(insA)
    val newB = oldB.exceptAll(delB).unionByName(insB)
    val direct = newA.join(newB, "ck")
      .groupBy("a", "ck", "b").agg(count(lit(1)).as("m"))
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    assert(maintained == direct, s"\n$maintained\nvs direct\n$direct")
  }

  private def A(rows: (Long, Long)*): DataFrame =
    rows.toDF("a", "ck")
  private def B(rows: (Long, String)*): DataFrame =
    rows.toDF("ck", "b")

  test("delta-join matches the direct join under mixed changes") {
    check(
      oldA = A((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L)),
      delA = A((2L, 10L)), insA = A((5L, 40L), (6L, 20L)),
      oldB = B((10L, "x"), (20L, "y"), (30L, "z")),
      delB = B((30L, "z")), insB = B((40L, "w")))
  }

  test("deleted-A × inserted-B cancellation leaves exactly one copy") {
    // order 2 (key 20) is deleted while customer 20 is REPLACED
    // (delete+insert): A⋈ΔB credits the stale order row, ΔA⋈ΔB's
    // sign product (−1·±1) must cancel it back out
    check(
      oldA = A((1L, 20L), (2L, 20L)),
      delA = A((2L, 20L)), insA = A(),
      oldB = B((20L, "old")),
      delB = B((20L, "old")), insB = B((20L, "new")))
  }

  test("multiplicities above 1 are maintained, not collapsed") {
    // duplicate A rows: view multiplicity 2, delete one → 1
    check(
      oldA = A((1L, 10L), (1L, 10L)),
      delA = A((1L, 10L)), insA = A(),
      oldB = B((10L, "x")), delB = B(), insB = B())
  }

  test("empty deltas are the identity") {
    check(
      oldA = A((1L, 10L), (2L, 20L)), delA = A(), insA = A(),
      oldB = B((10L, "x"), (20L, "y")), delB = B(), insB = B())
  }

  test("over-deletion fails loudly, not silently") {
    // changelog deletes a view row the view never had (order 9 was
    // never in oldA) — multiplicity would go to −1
    val oldA = A((1L, 10L))
    val oldB = B((10L, "x"))
    val dA = IncrementalAgg.signedDelta(
      deletes = A((9L, 10L)).unionByName(A((9L, 10L))), inserts = A())
    val dB = IncrementalAgg.signedDelta(deletes = B(), inserts = B())
    val out = IvmJoin.applyDelta(oldA.join(oldB, "ck"),
      IvmJoin.viewDelta(oldA, dA, oldB, dB, "ck"), viewCols)
    val e = intercept[Exception](out.collect())
    assert(e.getMessage.contains("multiplicity went negative") ||
      Option(e.getCause).exists(
        _.getMessage.contains("multiplicity went negative")), e)
  }
}
