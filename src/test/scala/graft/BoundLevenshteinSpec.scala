package graft

import graft.expressions.{BoundLevenshtein, GraftFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

class BoundLevenshteinSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  // parquet-backed, NOT a local Seq: ConvertToLocalRelation would
  // otherwise evaluate the whole filter at optimization time and
  // leave no Levenshtein in the plan to rewrite
  private lazy val df = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lev").toString + "/data"
    Seq(
      ("kitten", "sitting"),   // distance 3
      ("flaw", "lawn"),        // distance 2
      ("abc", "abd"),          // distance 1
      ("same", "same"),        // distance 0
      (null.asInstanceOf[String], "x")) // null in
      .toDF("a", "b").write.parquet(dir)
    spark.read.parquet(dir)
  }

  private def boundedCount(plan: DataFrame): Int =
    plan.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: Levenshtein if l.threshold.isDefined => l
      })
    }.flatten.size

  test("lev(a,b) <= k rewrites to the bounded early-exit form") {
    val q = df.filter(levenshtein(col("a"), col("b")) <= 1)
    assert(boundedCount(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getString(0)).toSet == Set("abc", "same"))
  }

  test("< and literal-on-left variants rewrite; results unchanged") {
    val lt = df.filter(levenshtein(col("a"), col("b")) < 3)
    assert(boundedCount(lt) == 1)
    assert(lt.collect().map(_.getString(0)).toSet == Set("abc", "same",
      "flaw"))
    val flipped = df.filter(lit(2) >= levenshtein(col("a"), col("b")))
    assert(boundedCount(flipped) == 1)
    assert(flipped.collect().map(_.getString(0)).toSet ==
      Set("abc", "same", "flaw"))
  }

  test("already-bounded and non-literal predicates are left alone") {
    // already bounded: stays one bounded node, no double wrap
    val q = df.filter(levenshtein(col("a"), col("b"), 1) >= 0)
    assert(boundedCount(q) == 1)
    // distance used as a VALUE (no comparison) must not rewrite
    val v = df.select(levenshtein(col("a"), col("b")).as("d"))
    assert(boundedCount(v) == 0)
    assert(v.collect().map(r =>
      if (r.isNullAt(0)) -99 else r.getInt(0)).toSet ==
      Set(3, 2, 1, 0, -99))
  }

  test("the rule itself is the rewriter (not some other optimization)") {
    val q = df.filter(levenshtein(col("a"), col("b")) <= 1)
    val before = q.queryExecution.analyzed
    val after = BoundLevenshtein(before)
    val rewritten = after.collect { case p =>
      p.expressions.flatMap(_.collect {
        case l: Levenshtein if l.threshold.isDefined => l
      })
    }.flatten
    assert(rewritten.size == 1)
  }
}
