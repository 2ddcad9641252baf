package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected canonical (u < v) edge list —
  * the graph-curation operator that extracts the dense backbone
  * (spam rings, well-connected entity clusters, link-farm detection)
  * by repeatedly discarding vertices with fewer than `k` surviving
  * neighbors.
  *
  * Two faces:
  *  - [[peel]]: EXACTLY `rounds` synchronous peeling steps — a
  *    deterministic bounded-round operator at any scale (each step:
  *    one degree aggregation + two semi-joins, all keyed by vertex;
  *    nothing driver-side). Each step only SHRINKS the edge set
  *    toward the true core, so the fixed-round face is the anytime
  *    approximation a budgeted pipeline runs, and what the n4 oracle
  *    unrolls.
  *  - [[peelToFixpoint]]: iterate until the edge count stops
  *    changing — the exact k-core. The per-round count is the same
  *    count-gating the iterative min-label CC uses; at 100 TB each
  *    round is one corpus-of-edges pass with the previous round
  *    persisted and the stale round released.
  *
  * Plan shape per round: degree = one map-side-combined groupBy over
  * the doubled edge list; survivor filter = two LEFT SEMI joins keyed
  * on the endpoint. Rounds persist their output (and release their
  * input) because round r+1 reads round r THREE times — degree twice
  * via the union, plus the semi-join probe — and an unpersisted chain
  * would re-derive the whole prefix exponentially.
  */
object KCore {

  private def oneRound(e: DataFrame, k: Int): DataFrame = {
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val keep = deg.filter(col("d") >= k).select("x")
    e.join(keep.withColumnRenamed("x", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("x", "v"), Seq("v"), "left_semi")
      // a USING join moves its key to the front — restore (u, v)
      .select("u", "v")
  }

  /** `rounds` synchronous peeling steps from `edges` (cols `u`, `v`,
    * canonical u < v, no duplicates). Returns the surviving edges.
    *
    * The INPUT persists (round 1 reads it three times — the degree
    * union twice plus the semi-join probe — and an expensive
    * upstream build like n4's co-purchase self-join would re-execute
    * per read), and NO round unpersists mid-chain: the old
    * unpersist-previous-round spelling removed each round's cache
    * entry before anything materialized, so the final consumer
    * re-derived round r from round r-1's LINEAGE — a 3^rounds
    * read fan-out of the base (the Bfs.minHops cache-discipline
    * lesson). Rounds release together via the caller's
    * `releaseAll()`; peak cache is the shrinking per-round series. */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 0,
      s"k must be >= 1 and rounds >= 0: $k/$rounds")
    var e = edges.select(col("u"), col("v"))
    if (rounds > 0) e = Broadcasting.track(e.persist())
    for (r <- 1 to rounds) {
      // lineage cut on the cadence (Iterate doc): localCheckpoint
      // both persists (what the else-branch persist() did) and
      // resets the chain to a leaf, so a deep peel's plan depth is
      // bounded by the cadence instead of `rounds`
      e =
        if (Iterate.due(edges.sparkSession, r))
          Iterate.cut(oneRound(e, k))
        else Broadcasting.track(oneRound(e, k).persist())
    }
    e
  }

  /** Exact k-core: peel until the edge count is stable (one count
    * action per round — the CC-style gate), capped at `maxRounds`.
    *
    * No mid-loop unpersist: releasing round r after counting round
    * r+1 makes the CacheManager recache-invalidate r+1's JUST
    * materialized buffers (the Bfs.minHops lesson — a dependent
    * cache entry is re-compiled, data discarded, when its parent
    * uncaches), turning the loop quadratic. Rounds stay cached until
    * the caller's `releaseAll()`; peak cache is Σ rounds' edge sets,
    * a monotonically SHRINKING series bounded by rounds × |E|. */
  def peelToFixpoint(edges: DataFrame, k: Int,
    maxRounds: Int = 100): DataFrame = {
    require(k >= 1 && maxRounds >= 1,
      s"k must be >= 1 and maxRounds >= 1: $k/$maxRounds")
    var e = Broadcasting.track(
      edges.select(col("u"), col("v")).persist())
    var n = e.count()
    var r = 0
    var stable = false
    while (!stable && r < maxRounds) {
      r += 1
      // lineage cut on the cadence (Iterate doc) — localCheckpoint
      // persists AND resets the chain to a leaf; the count then
      // reads the materialized RDD
      val next =
        if (Iterate.due(edges.sparkSession, r))
          Iterate.cut(oneRound(e, k))
        else Broadcasting.track(oneRound(e, k).persist())
      val m = next.count()
      e = next
      stable = m == n
      n = m
    }
    e
  }

  /** Per-vertex degree of an edge list — (id, deg). On a peeled
    * frame this is the in-core degree (≥ k at the fixpoint). */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("id"))
      .unionAll(edges.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
}
