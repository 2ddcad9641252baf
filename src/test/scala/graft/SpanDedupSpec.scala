package graft

import graft.operators.{Broadcasting, SpanDedup}

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int) =
    try SpanDedup.dupSpanCounts(
      docs.toDF("doc_id", "text"), "doc_id", "text", window)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    finally Broadcasting.releaseAll()

  test("cross-doc shared spans are counted per document") {
    val docs = Seq(
      1L -> "a b c d e",         // spans: abc bcd cde
      2L -> "x b c d y",         // spans: xbc bcd cdy — shares bcd
      3L -> "p q r s",           // no shared span
      4L -> "a b c a b c a b")   // distinct spans: abc bca cab — shares abc
    assert(run(docs, 3) == Seq(
      (1L, 2L),  // abc (with 4), bcd (with 2)
      (2L, 1L),
      (4L, 1L)))
  }

  test("a span repeated only WITHIN one doc is not a duplicate") {
    // "a b c" occurs twice in the single doc — count_distinct folds
    // it to one sharer, so the doc does not appear
    assert(run(Seq(1L -> "a b c a b c", 2L -> "q r s t"), 3).isEmpty)
  }

  test("docs shorter than the window never appear") {
    val docs = Seq(1L -> "a b", 2L -> "a b", 3L -> "a b c", 4L -> "a b c")
    // the two 3-token docs share their single span; 2-token docs have none
    assert(run(docs, 3) == Seq((3L, 1L), (4L, 1L)))
  }

  test("multi-space runs tokenize like the oracle (empties dropped)") {
    val docs = Seq(1L -> "a  b   c d", 2L -> "a b c z")
    assert(run(docs, 3) == Seq((1L, 1L), (2L, 1L)))
  }

  test("plan is an inverted index — no pair join, no cartesian") {
    val df = Seq(1L -> "a b c d", 2L -> "a b c e").toDF("doc_id", "text")
    val q = SpanDedup.dupSpanCounts(df, "doc_id", "text", 3)
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // the expensive window hash must be computed ABOVE the explode,
      // once per position — never cloned into a generator filter
      val hashes = "xxhash64".r.findAllIn(plan).length
      assert(hashes <= 2, s"window hash cloned $hashes times:\n$plan")
    } finally Broadcasting.releaseAll()
  }

  test("window must be at least 2") {
    val df = Seq(1L -> "a b").toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      SpanDedup.dupSpanCounts(df, "doc_id", "text", 1))
  }
}
