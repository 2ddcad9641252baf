package graft

import graft.operators.{Broadcasting, Decontaminate}

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "entirely different words with no overlap here at all"),
    (3L, "what does the fox say the quick brown fox appears"))
    .toDF("id", "text")

  private def benchmark = Seq(
    (100L, "the quick brown fox is a benchmark question"))
    .toDF("id", "text")

  test("hits counts distinct shared n-grams per corpus document") {
    val out = Decontaminate.hits(corpus, benchmark, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Broadcasting.releaseAll()
    // doc 1 shares "the quick brown" + "quick brown fox"; doc 3 shares
    // the same two (each counted once despite "fox" repeats); doc 2 none
    assert(out == Map(1L -> 2L, 3L -> 2L))
  }

  test("clean drops every contaminated document and keeps the rest") {
    val out = Decontaminate.clean(corpus, benchmark, "id", "text", n = 3)
    Broadcasting.releaseAll()
    assert(out.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(out.columns.toSeq == Seq("id", "text"))
  }

  test("documents shorter than n grams never match") {
    val shortBench = Seq((9L, "too short")).toDF("id", "text")
    val out = Decontaminate.hits(corpus, shortBench, "id", "text", n = 3)
    Broadcasting.releaseAll()
    assert(out.count() == 0L)
  }

  test("n is validated") {
    intercept[IllegalArgumentException](
      Decontaminate.hits(corpus, benchmark, "id", "text", n = 0)
        .collect())
  }
}
