package graft

import graft.operators.Repetition

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(text: String) =
    Repetition.stats(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .collect().headOption
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))

  test("fully repeated text scores maximal fractions") {
    // 4 words, 1 distinct → dup 7500; bigram "a a" 3/3 → 10000
    assert(stats("a a a a").contains((4L, 7500L, 10000L)))
  }

  test("all-distinct text scores zero duplication") {
    val Some((n, dup, top)) = stats("one two three four")
    assert(n == 4L && dup == 0L)
    // every bigram unique: top = 1/3 → 3333
    assert(top == 3333L)
  }

  test("single-token documents have no bigrams") {
    assert(stats("word").contains((1L, 0L, 0L)))
  }

  test("empty documents are dropped") {
    assert(stats("   ").isEmpty)
  }

  test("degenerate boilerplate is separable from clean text") {
    // "la la la ..." (20×) vs prose: the filterable signal Gopher cuts
    val Some((_, _, la)) = stats(Seq.fill(20)("la").mkString(" "))
    val Some((_, _, prose)) = stats(
      "it was the best of times it was the worst of times")
    assert(la == 10000L)
    assert(prose < 2000L)
  }

  test("half-up rounding matches the oracle arithmetic") {
    // 3 words, 2 distinct → (3-2)*10000/3 = 3333.33 → 3333
    // bigrams: "b b" 1 of 2 → 5000
    assert(stats("a b b").contains((3L, 3333L, 5000L)))
  }
}
