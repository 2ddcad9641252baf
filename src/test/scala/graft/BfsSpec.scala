package graft

import graft.operators.{Bfs, Broadcasting}
import org.apache.spark.sql.functions._

class BfsSpec extends SparkTestBase {
  import spark.implicits._

  // directed: 1→2→3→4→5 chain, a shortcut 1→6, a back-edge 6→1
  // (cycle), and an island 8→9 unreachable from 1
  private def graph = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (1L, 6L), (6L, 1L), (8L, 9L)).toDF("src", "dst")

  private def hops(sources: Seq[Long], maxHops: Int): Map[Long, Int] =
    try Bfs.minHops(graph, sources.toDF("id"), maxHops)
      .as[(Long, Int)].collect().toMap
    finally Broadcasting.releaseAll() // even on a failed collect

  test("single source: BFS levels with a cycle, bounded at maxHops") {
    assert(hops(Seq(1L), 3) ==
      Map(1L -> 0, 2L -> 1, 6L -> 1, 3L -> 2, 4L -> 3), hops(Seq(1L), 3))
    // one more hop reaches 5; the 6→1 back-edge never re-admits 1
    assert(hops(Seq(1L), 4)(5L) == 4)
    // the island stays unreachable at any budget
    assert(!hops(Seq(1L), 10).contains(9L))
  }

  test("multi-source: minimum over sources, first admission wins") {
    val h = hops(Seq(1L, 4L), 2)
    // 4 is a source (0), so 5 is 1 hop — not 4 via the chain from 1
    assert(h(4L) == 0 && h(5L) == 1 && h(3L) == 2, h)
  }

  test("maxHops 0 returns exactly the distinct sources at level 0") {
    assert(hops(Seq(1L, 1L, 8L), 0) == Map(1L -> 0, 8L -> 0))
  }

  test("early exhaustion: frontier empties before the budget") {
    // from 8 the whole reachable set is {8, 9}; budget 10 must not
    // loop or error past the 1-hop frontier
    assert(hops(Seq(8L), 10) == Map(8L -> 0, 9L -> 1))
  }

  test("exhaustCheck=false (fully lazy) matches the checked mode") {
    // including past exhaustion: empty levels are no-ops by
    // construction, so the lazy fixed-round plan is value-identical
    for ((src, budget) <- Seq((Seq(1L), 3), (Seq(1L, 4L), 2),
      (Seq(8L), 10))) {
      val lazyOut =
        try Bfs.minHops(graph, src.toDF("id"), budget,
          exhaustCheck = false).as[(Long, Int)].collect().toMap
        finally Broadcasting.releaseAll()
      assert(lazyOut == hops(src, budget), (src, budget))
    }
  }
}
