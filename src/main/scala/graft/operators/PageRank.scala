package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the web-graph quality
  * signal a large-scale corpus-curation pipeline uses to weight
  * crawled sources (OPIC / Common-Crawl-style harmonic ranking is the
  * same join-aggregate shape).
  *
  * INTEGER-EXACT by construction, like `KMeans.fitE6`: ranks are
  * int64 at e12 scale and every per-iteration term is integer floor
  * arithmetic —
  *
  *   rank0(v)   = 1e12 div N
  *   rank_t+1(v) = ((100-d)·1e12) div (100·N)
  *               + Σ_{u→v} (d·rank_t(u)) div (100·outdeg(u))
  *
  * with d the damping percentage (85 = the classic 0.85). Exactness
  * is what lets an ITERATIVE graph algorithm hash-match a DuckDB
  * oracle of unrolled CTEs; the cost is that per-iteration floor
  * truncation leaks ≤1e-12·outdeg of mass per node — irrelevant for
  * ranking, and identical on both engines.
  *
  * Plan shape (per iteration): one hash join rank⋈edges on `src`
  * (both sides hash-partitioned on the same key, so AQE can reuse the
  * exchange), one aggregate on `dst`, one left join back to the node
  * set for isolated-in-degree nodes. The node count enters as a
  * 1-row aggregate frame joined via broadcast — never a driver-side
  * collect, so plan construction stays fully lazy.
  *
  * At 100 TB: the edge list is the big frame; it is persisted once
  * (tracked via `Broadcasting.track` → `releaseAll()`) and every
  * iteration shuffles only (id, rank) pairs — 16 bytes per node, not
  * the corpus. Lineage grows linearly with `iters`; past ~10 rounds
  * checkpoint the rank frame per round (same localization note as
  * `IvfIndex`). Dangling nodes (out-degree 0) never appear by
  * construction when the edge set is symmetric; for general directed
  * graphs their mass is dropped (the standard simplification) —
  * documented rather than redistributed.
  */
object PageRank {

  /** Edges (srcCol, dstCol) with integral node ids; duplicates are
    * collapsed. Returns (id: long, rank_e12: long) for every node
    * that appears as a source (for symmetric edge sets: every node).
    */
  def ranksE12(edges: DataFrame, srcCol: String, dstCol: String,
    iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be a percentage, got $dampingPct")
    // repartition(src) FIRST, dedup after (r22): hash(src) partitioning
    // satisfies the dedup aggregate's ClusteredDistribution((src, dst))
    // — equal (src, dst) rows share a src — so the distinct runs
    // exchange-free on the already-src-partitioned data and its output
    // KEEPS that partitioning for the persist. The r21 spelling
    // (distinct → repartition) paid two full edge-list exchanges for
    // the same frame. The persist stays src-partitioned so every
    // iteration's rank⋈edges join moves only (id, rank) pairs, and
    // outdeg/nodes (both grouped by src) fold into the same
    // partitioning with no exchange of their own.
    val e = Broadcasting.track(Caching.persistCorpus(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")))
    // the per-iteration join partner is e WITH its out-degree folded
    // in (r21): the degree join runs ONCE here — on two src-
    // partitioned frames, so no extra exchange — instead of once per
    // iteration (which also rebuilt an outdeg broadcast per round).
    // nodes persists too: it feeds the init and every round's left
    // join. Both caches are edge/node-sized, never wider.
    val eOd = Broadcasting.track(Caching.persistCorpus(e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")))
    val nodes = Broadcasting.track(
      e.select(col("src").as("id")).distinct().persist())
    // 1-row frame: the teleport denominator. Broadcast-joined below,
    // so N never touches the driver and the plan stays lazy.
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))

    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("id"),
        expr("1000000000000L div n_nodes").as("rank_e12"))
    for (i <- 1 to iters) {
      val inflow = eOd
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr(s"($dampingPct * rank_e12) div (100 * outdeg)")
            .as("contrib"))
        .groupBy("id")
        .agg(sum("contrib").as("inflow"))
      ranks = nodes
        .join(inflow, Seq("id"), "left")
        .crossJoin(broadcast(nn))
        .select(col("id"),
          (expr(s"((100 - $dampingPct) * 1000000000000L)" +
            " div (100 * n_nodes)") +
            coalesce(col("inflow"), lit(0L))).as("rank_e12"))
      // lineage cut (Iterate doc): the rank recurrence nests one
      // join-chain per iteration — linear, but a 20-iteration plan
      // still re-analyzes the whole history at every consumer. On
      // the cadence, materialize the (id, rank) frame — the SMALL
      // per-round working set — and restart the chain from a leaf.
      if (i < iters && Iterate.due(edges.sparkSession, i))
        ranks = Iterate.cut(ranks)
    }
    ranks
  }

  /** Personalized PageRank: identical recurrence, but ALL teleport
    * mass lands on `seeds` (col `id`) instead of spreading
    * uniformly — the recommendation / trust-propagation primitive
    * ("rank relative to what THIS user touched"). With seeds = all
    * nodes it degenerates to [[ranksE12]] exactly (spec-asserted),
    * which pins the shared recurrence. Same plan shape: the seed
    * set joins in as a broadcast flag; per-iteration shuffles still
    * carry only (id, rank) pairs. Nodes unreachable from the seed
    * set keep rank 0 — kept in the output, not filtered, so the
    * frame stays the node set at every seed choice. */
  def personalizedE12(edges: DataFrame, srcCol: String, dstCol: String,
    seeds: DataFrame, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be a percentage, got $dampingPct")
    // repartition-first dedup, same rationale as ranksE12 (one edge
    // exchange instead of two; partitioning survives for the joins)
    val e = Broadcasting.track(Caching.persistCorpus(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")))
    // same degree-fold + persist rationale as ranksE12 — the teleport
    // term additionally re-reads nodes once per iteration
    val eOd = Broadcasting.track(Caching.persistCorpus(e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")))
    val nodes = Broadcasting.track(
      e.select(col("src").as("id")).distinct().persist())
    val seedSet = seeds.select(col("id").cast("long").as("id"))
      .distinct()
    val ns = seedSet.agg(count(lit(1)).as("n_seeds"))
    // per-node teleport term (e12): 1/n_seeds of the teleport mass
    // for seeds, zero elsewhere — built once, reused per iteration
    def teleport(scalePct: Int) = nodes
      .join(broadcast(seedSet.withColumn("is_seed", lit(1L))),
        Seq("id"), "left")
      .crossJoin(broadcast(ns))
      .select(col("id"),
        when(col("is_seed").isNotNull,
          expr(s"($scalePct * 1000000000000L) div (100 * n_seeds)"))
          .otherwise(lit(0L)).as("tp"))
    var ranks = teleport(100)
      .select(col("id"), col("tp").as("rank_e12"))
    for (i <- 1 to iters) {
      val inflow = eOd
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr(s"($dampingPct * rank_e12) div (100 * outdeg)")
            .as("contrib"))
        .groupBy("id")
        .agg(sum("contrib").as("inflow"))
      ranks = teleport(100 - dampingPct)
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (col("tp") + coalesce(col("inflow"), lit(0L)))
            .as("rank_e12"))
      // lineage cut on the cadence — same rationale as ranksE12
      if (i < iters && Iterate.due(edges.sparkSession, i))
        ranks = Iterate.cut(ranks)
    }
    ranks
  }
}
