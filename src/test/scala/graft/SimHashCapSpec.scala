package graft

import graft.operators.TextDedupQueries
import org.apache.spark.sql.functions._

/** The opt-in SimHash bucket cap (BASELINE.md's d6 mitigation as a
  * pullable lever): keep-lowest `cap` docs per (source, band, value)
  * bucket, routed through the GroupedTopK heap so the per-bucket
  * aggregation buffer — not just the pair output — is bounded. */
class SimHashCapSpec extends SparkTestBase {
  import spark.implicits._

  // five byte-identical docs (same simhash, so they share EVERY
  // band bucket) plus one unrelated doc in another source
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today", "s"),
    (2L, "the quick brown fox jumps over the lazy dog today", "s"),
    (3L, "the quick brown fox jumps over the lazy dog today", "s"),
    (4L, "the quick brown fox jumps over the lazy dog today", "s"),
    (5L, "the quick brown fox jumps over the lazy dog today", "s"),
    (9L, "completely different words about spark plans shuffles", "t"))
    .toDF("doc_id", "text", "source")

  private def pairs(cap: Option[Int]): Set[(Long, Long, Long)] =
    TextDedupQueries.simhashPairs(corpus, cap)
      .as[(Long, Long, Long)].collect().toSet

  test("cap keeps the lowest docs per bucket; capped ⊆ uncapped") {
    val all = pairs(None)
    // identical docs collide at hamming 0 in every band
    val expectAll = (for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b, 0L)).toSet
    assert(all == expectAll, s"uncapped: $all")
    // cap=2 keeps doc 1 and 2 in every bucket (keep-LOWEST is the
    // deterministic contract) — exactly one pair survives
    assert(pairs(Some(2)) == Set((1L, 2L, 0L)))
    // cap=3 → the three lowest docs, their three pairs
    assert(pairs(Some(3)) ==
      Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
    // a cap above every bucket size is lossless
    assert(pairs(Some(100)) == expectAll)
    intercept[IllegalArgumentException](pairs(Some(1)))
  }

  test("the cap routes through the bounded GroupedTopK heap") {
    val capped = TextDedupQueries.simhashPairs(corpus, Some(2))
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
    val uncapped = TextDedupQueries.simhashPairs(corpus, None)
    assert(!uncapped.queryExecution.executedPlan.toString
      .contains("GroupedTopK"))
  }

  test("the LSH band-bucket cap is the same lever: keep-lowest, " +
    "subset, heap-routed") {
    import graft.operators.MinHashLsh
    val d = corpus.select("doc_id", "text")
    def pairs(cap: Option[Int]) =
      MinHashLsh.candidatePairs(d, "doc_id", "text", cap)
        .as[(Long, Long, Long)].collect().toSet
    val all = pairs(None)
    // the five byte-identical docs share every band: all 10 pairs,
    // each colliding in all 4 bands
    assert(all.filter(p => p._1 <= 5 && p._2 <= 5) ==
      (for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b, 4L)).toSet,
      s"uncapped: $all")
    // cap=2 keeps docs 1 and 2 in every bucket — one pair, and its
    // n_shared_bands still counts all 4 buckets where both survived
    assert(pairs(Some(2)).filter(p => p._1 <= 5 && p._2 <= 5) ==
      Set((1L, 2L, 4L)))
    assert(pairs(Some(2)).subsetOf(all))
    assert(pairs(Some(100)) == all)
    intercept[IllegalArgumentException](pairs(Some(1)))
    val plan = MinHashLsh.candidatePairs(d, "doc_id", "text", Some(2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), plan)
  }
}
