package graft

import graft.operators.KCore
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  // a 4-clique (1,2,3,4) with a pendant chain 4-5-6 hanging off it
  private def cliqueChain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L)).toDF("u", "v")

  test("fixpoint 3-core keeps the clique, sheds the chain") {
    val core = KCore.peelToFixpoint(cliqueChain, k = 3)
      .as[(Long, Long)].collect().toSet
    assert(core == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)), core)
    graft.operators.Broadcasting.releaseAll()
  }

  test("chain peeling needs multiple rounds; fixed rounds are a prefix") {
    // 2-core of a pure path 1-2-3-4-5 is empty, but each round only
    // removes the current endpoints — 1 round leaves the middle edges
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val after1 = KCore.peel(path, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toSet
    assert(after1 == Set((2L, 3L), (3L, 4L)), after1)
    val fix = KCore.peelToFixpoint(path, k = 2)
    assert(fix.count() == 0)
    // rounds = 0 is the identity
    assert(KCore.peel(path, k = 2, rounds = 0).count() == 4)
    graft.operators.Broadcasting.releaseAll()
  }

  test("fixpoint invariants on the co-purchase graph (sf0.001)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .filter(col("a.l_partkey") < col("b.l_partkey"))
      .select(col("l_orderkey"),
        col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select("u", "v")
    val core = KCore.peelToFixpoint(e, k = 2)
    // invariant 1: every in-core vertex has in-core degree >= k
    val minDeg = KCore.degrees(core).agg(min("deg")).head.getLong(0)
    assert(core.count() == 0 || minDeg >= 2, s"minDeg=$minDeg")
    // invariant 2: the fixpoint is stable — one more round is a no-op
    assert(KCore.peel(core, k = 2, rounds = 1).count() == core.count())
    graft.operators.Broadcasting.releaseAll()
  }
}
