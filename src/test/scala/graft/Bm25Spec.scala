package graft

import graft.operators.Bm25

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    1L -> "spark streams data fast",
    2L -> "spark spark spark joins tables",
    3L -> "ducks swim on the pond",
    4L -> "spark").toDF("doc_id", "text")

  test("ranking follows tf saturation and length normalization") {
    val top = Bm25.topDocs(corpus, "doc_id", "text", Seq("spark"), 4)
      .as[(Long, Long)].collect().toSeq
    // doc 3 has no match and must be absent entirely
    assert(top.map(_._1).toSet == Set(1L, 2L, 4L))
    // tf=3 (even at dl=5) outscores the all-query-term 1-token doc:
    // k1=1.2 saturates slowly enough that repeated matches still win;
    // both beat the tf=1 dl=4 doc
    assert(top.map(_._1) == Seq(2L, 4L, 1L), top.toString)
    // scores strictly positive and ordered
    assert(top.map(_._2) == top.map(_._2).sorted.reverse)
    assert(top.forall(_._2 > 0))
  }

  test("multi-term scores sum per doc; rarer terms weigh more") {
    val docs = Seq(
      1L -> "a a b c",
      2L -> "a b b c",
      3L -> "a c c c",
      4L -> "a x y z").toDF("doc_id", "text")
    // 'b' appears in 2 docs, 'a' in all 4 → idf(b) > idf(a)
    val s = Bm25.termScores(docs, "doc_id", "text", Seq("a", "b"))
      .select("doc_id", "term", "tscore_e4")
      .as[(Long, String, Long)].collect()
      .groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).max }
    assert(s("b") > s("a"), s.toString)
    // doc 3/4 have no 'b' row
    val terms = Bm25.termScores(docs, "doc_id", "text", Seq("b"))
      .select("doc_id").as[Long].collect().toSet
    assert(terms == Set(1L, 2L))
  }

  test("ties at the k boundary break by id — deterministic cut") {
    val docs = Seq(1L -> "q w", 2L -> "q w", 3L -> "q w")
      .toDF("doc_id", "text")
    val top = Bm25.topDocs(docs, "doc_id", "text", Seq("q"), 2)
      .as[(Long, Long)].collect().toSeq
    assert(top.map(_._1) == Seq(1L, 2L))
    assert(top(0)._2 == top(1)._2)
  }

  test("top-k plans as TakeOrdered, never a global sort") {
    val plan = Bm25.topDocs(corpus, "doc_id", "text", Seq("spark"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bad inputs fail loudly") {
    intercept[IllegalArgumentException](
      Bm25.topDocs(corpus, "doc_id", "text", Seq(), 2))
    intercept[IllegalArgumentException](
      Bm25.topDocs(corpus, "doc_id", "text", Seq("a", "a"), 2))
    intercept[IllegalArgumentException](
      Bm25.topDocs(corpus, "doc_id", "text", Seq("a"), 0))
    intercept[IllegalArgumentException](
      Bm25.termScores(corpus.withColumnRenamed("text", "tf"),
        "doc_id", "tf", Seq("a")))
  }
}
