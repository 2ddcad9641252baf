package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line reference: classic DP levenshtein. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val words = Seq(
    "grape", "graph", "grapes", "rape", "gripe", "grap",
    "apple", "ample", "apples", "appl",
    "kiwi", "kiw", "kiwis", "qiwi",
    "stone", "atone", "stones", "shone", "sxone",
    "zebra", "cobra")

  private def df = words.zipWithIndex
    .map { case (w, i) => (i.toLong, w) }.toDF("id", "name")

  test("pairs equal the brute-force cross join at distance <= 1") {
    val expected = (for {
      i <- words.indices; j <- words.indices
      if i < j && lev(words(i), words(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    val got = FuzzyJoin.edLeq1SelfJoin(df, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    // sanity on the fixture: sub, insert, delete all present; and
    // at least one distance-2 decoy was excluded
    assert(expected.nonEmpty)
    assert(lev("grape", "gripe") == 1 && lev("grape", "grapes") == 1
      && lev("grape", "grap") == 1 && lev("grape", "apple") > 1)
  }

  test("identical keys under distinct ids pair at distance 0") {
    val d2 = Seq((1L, "same"), (2L, "same"), (3L, "diff"))
      .toDF("id", "name")
    val got = FuzzyJoin.edLeq1SelfJoin(d2, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("empty and single-char strings are handled") {
    val d2 = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"))
      .toDF("id", "name")
    val got = FuzzyJoin.edLeq1SelfJoin(d2, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // "" ~ "a", "" ~ "b", "a" ~ "b" (sub), "a" ~ "ab", "b" ~ "ab"
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("the plan is a signature equi-join, never a cross product") {
    val plan = FuzzyJoin.edLeq1SelfJoin(df, "id", "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"pairs² plan detected:\n$plan")
  }

  test("result is invariant under repartitioning") {
    val base = FuzzyJoin.edLeq1SelfJoin(df, "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val rep = FuzzyJoin.edLeq1SelfJoin(df.repartition(7), "id", "name")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(base == rep)
  }
}
