package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line reference of the exact integer recurrence. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
    dampingPct: Int = 85): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) =>
          (dampingPct * r(src)) / (100 * outdeg(src))
        }.sum
      }
      r = nodes.map(id =>
        id -> (((100L - dampingPct) * 1000000000000L) / (100 * n)
          + inflow.getOrElse(id, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int)
  : Map[Long, Long] =
    PageRank.ranksE12(edges.toDF("s", "d"), "s", "d", iters)
      .as[(Long, Long)].collect().toMap

  test("matches the straight-line reference on an asymmetric graph") {
    // 1↔2, 2↔3, 3↔4, 4↔1, 1↔3: node degrees differ, so the
    // reference exercises real outdeg divisions.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = und ++ und.map(_.swap)
    assert(run(edges, 3) == refRanks(edges, 3))
  }

  test("symmetric 2-node graph splits the mass exactly") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val got = run(edges, 4)
    assert(got(1L) == got(2L))
    // each node: teleport 75e9 + 85% of the other's full rank;
    // fixpoint at 500e9 exactly (divisions are exact here)
    assert(got(1L) == 500000000000L)
  }

  test("hub of a star ranks above the leaves") {
    // hub 0 connected to leaves 1..6, symmetric
    val und = (1L to 6L).map(l => (0L, l))
    val edges = und ++ und.map(_.swap)
    val got = run(edges, 3)
    assert((1L to 6L).forall(l => got(0L) > got(l)))
    // leaves are symmetric: identical ranks
    assert((1L to 6L).map(got).toSet.size == 1)
  }

  test("total mass stays within floor-truncation loss of 1e12") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (1L, 3L), (2L, 5L))
    val edges = und ++ und.map(_.swap)
    val got = run(edges, 3)
    val total = got.values.sum
    // every node truncates at most outdeg+1 units per round
    assert(total <= 1000000000000L
      && total > 1000000000000L - 1000L, s"mass drifted: $total")
  }

  test("deterministic under repartitioning") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 2L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val a = PageRank.ranksE12(edges, "s", "d", 3)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.ranksE12(edges.repartition(5), "s", "d", 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("personalized with seeds = all nodes equals plain PageRank") {
    // the degenerate case pins the shared recurrence: uniform
    // teleport IS all-nodes personalization
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val allNodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val ppr = PageRank.personalizedE12(edges, "s", "d", allNodes, 3)
      .as[(Long, Long)].collect().toMap
    assert(ppr == run(und ++ und.map(_.swap), 3), ppr)
  }

  test("personalized mass concentrates around the seed") {
    // star 1→{2,3,4}, all edges symmetric; seed at leaf 2: the hub
    // inherits more rank than the non-seed leaves, and leaf 2 keeps
    // the teleport floor while 3/4 only get hub spillover
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "d")
    val got = PageRank.personalizedE12(edges, "s", "d",
      Seq(2L).toDF("id"), 4).as[(Long, Long)].collect().toMap
    assert(got(2L) > got(3L) && got(1L) > got(3L), got)
    assert(got(3L) == got(4L), got) // symmetric non-seeds tie
    graft.operators.Broadcasting.releaseAll()
  }
}
