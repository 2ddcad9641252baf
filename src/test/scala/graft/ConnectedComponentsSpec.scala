package graft

import graft.operators.{Broadcasting, ConnectedComponents}
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], maxIter: Int = 25,
    localEdgeCap: Long = ConnectedComponents.LocalEdgeCap) =
    ConnectedComponents.minLabel(
      edges.toDF("a", "b"), "a", "b", maxIter, localEdgeCap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, cliques, and separate components all close to min id") {
    // chain 1-2-3-4, triangle 10-11-12, isolated edge 20-21
    val m = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("label flows against edge direction too (undirected)") {
    // min id at the 'dst' end of every edge
    val m = comps(Seq((5L, 1L), (9L, 5L)))
    assert(m.values.toSet == Set(1L))
  }

  test("iterative path agrees with the local union-find path exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L), (5L, 1L), (9L, 5L))
    // localEdgeCap = 0 forces the iterative branch
    assert(comps(edges, localEdgeCap = 0L) == comps(edges))
  }

  test("non-convergence within maxIter throws rather than returning wrong labels") {
    val chain = (1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    // force the iterative branch; a 12-chain needs more than 2 rounds
    intercept[IllegalStateException](
      comps(chain, maxIter = 2, localEdgeCap = 0L))
  }

  test("internal persists are tracked and reclaimed by releaseAll") {
    Broadcasting.releaseAll() // start from an empty registry
    val local = ConnectedComponents.minLabel(
      Seq((1L, 2L)).toDF("a", "b"), "a", "b")
    val iter = ConnectedComponents.minLabel(
      Seq((1L, 2L)).toDF("a", "b"), "a", "b", localEdgeCap = 0L)
    import org.apache.spark.storage.StorageLevel
    assert(local.storageLevel != StorageLevel.NONE, "local result not cached")
    assert(iter.storageLevel != StorageLevel.NONE, "iterative result not cached")
    Broadcasting.releaseAll()
    assert(local.storageLevel == StorageLevel.NONE,
      "releaseAll left the union-find result cached")
    assert(iter.storageLevel == StorageLevel.NONE,
      "releaseAll left the iterative result cached")
  }

  test("dedupGroups attaches component sizes") {
    val g = ConnectedComponents.dedupGroups(
      Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(g == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }
}
