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

  test("lineage-cut cadence never changes results (0 / 1 / default)") {
    // Iterate.cut is a plan-shape lever only: disabled, every-round,
    // and default cadences must produce identical BFS output (the
    // every-round setting exercises the collapse on EVERY iteration,
    // including the re-split frontier filter)
    def run(every: String): Map[Long, Int] =
      try {
        spark.conf.set(graft.operators.Iterate.CheckpointEveryKey, every)
        hops(Seq(1L, 8L), 5)
      } finally
        spark.conf.unset(graft.operators.Iterate.CheckpointEveryKey)
    val default = hops(Seq(1L, 8L), 5)
    assert(run("0") == default)
    assert(run("1") == default)
    assert(run("2") == default)
  }

  test("path doubling equals the frontier walk in both seed modes, " +
    "in ⌈log₂ n⌉ rounds") {
    // the doubling closure must be output-identical to
    // minHopsPerSource on the hand-walked graph — every maxHops,
    // every source choice, both seedReached modes (p* origin-at-0
    // vs p+ cycle-back-at-cycle-length: 1→6→1 pins the closed-walk
    // recurrence)
    def collect(df: org.apache.spark.sql.DataFrame) =
      try df.as[(Long, Long, Int)].collect().toSet
      finally Broadcasting.releaseAll()
    for {
      srcs <- Seq(Seq(1L), Seq(1L, 8L), Seq(1L, 2L, 3L, 4L, 6L, 8L))
      maxHops <- 0 to 5
      seedReached <- Seq(true, false)
    } {
      val frontier = collect(Bfs.minHopsPerSource(graph,
        srcs.toDF("id"), maxHops, seedReached = seedReached))
      val doubled = collect(Bfs.minHopsDoubling(graph,
        srcs.toDF("id"), maxHops, seedReached = seedReached))
      assert(doubled == frontier,
        s"srcs=$srcs maxHops=$maxHops seedReached=$seedReached\n" +
          s"doubled=$doubled\nfrontier=$frontier")
    }
    // the round count is the logarithm, not the budget
    assert(Seq(0, 1, 2, 3, 4, 5, 8, 9).map(Bfs.doublingRounds) ==
      Seq(0, 0, 1, 2, 2, 3, 3, 4))
  }

  test("allPairsMinHops routes by depth at ONE decision point; both " +
    "routes identical on the n7 oracle fixture") {
    // route asserted per regime: shallow → frontier, deep → doubling
    assert(Seq(1, 2, 3, 4).forall(!Bfs.routesToDoubling(_)),
      "shallow depths must take the frontier walk")
    assert(Seq(5, 8, 100).forall(Bfs.routesToDoubling),
      "deep depths must take the doubling closure")
    // the n7 fixture: customer→nation→region located_in edges, same
    // construction as LinkageQueries.locatedInTriples at sf0.001
    val sf = "/root/testdata/sf0.001"
    val edges = Tables.load(spark, sf, "customer").select(
        concat(lit("c"), col("c_custkey")).as("src"),
        concat(lit("n"), col("c_nationkey")).as("dst"))
      .unionByName(Tables.load(spark, sf, "nation").select(
        concat(lit("n"), col("n_nationkey")).as("src"),
        concat(lit("r"), col("n_regionkey")).as("dst")))
      .distinct()
    val sources = edges.select(col("src").as("id")).distinct()
    def collect(df: org.apache.spark.sql.DataFrame) =
      try df.as[(String, String, Int)].collect().toSet
      finally Broadcasting.releaseAll()
    for (seedReached <- Seq(true, false);
         maxHops <- Seq(2, 8)) { // one depth per regime
      val frontier = collect(Bfs.minHopsPerSource(edges, sources,
        maxHops, exhaustCheck = false, seedReached = seedReached))
      val doubled = collect(Bfs.minHopsDoubling(edges, sources,
        maxHops, seedReached = seedReached))
      val routed = collect(Bfs.allPairsMinHops(edges, sources,
        maxHops, seedReached = seedReached))
      assert(frontier == doubled,
        s"routes diverge on n7 fixture at maxHops=$maxHops " +
          s"seedReached=$seedReached")
      assert(routed == frontier && routed.nonEmpty,
        s"routed face broke at maxHops=$maxHops")
    }
  }
}
