package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source bounded-hop BFS over a directed edge list — minimum
  * hop distance from ANY source, the reachability / property-path
  * primitive behind SPARQL `p{,n}` paths over the RDF view
  * (reference emits GeoSPARQL graphs whose natural queries chain
  * predicates: `U-RDF:152-153`'s triple model is exactly the (src,
  * dst) edge list this operator walks), friend-of-friend expansion,
  * and curation blast-radius checks ("everything within 3 links of a
  * flagged domain").
  *
  * Synchronous frontier expansion with a visited set:
  *
  *   visited_0 = frontier_0 = sources at hops 0
  *   frontier_h = distinct successors of frontier_{h-1}
  *                minus visited_{h-1}          (LEFT ANTI join)
  *   visited_h  = visited_{h-1} ∪ frontier_h at hops h
  *
  * Minimality needs no min() aggregate: a node joins `visited` the
  * FIRST round it is reachable and the anti-join bars re-admission,
  * so its recorded hop count is its BFS level — the invariant
  * BfsSpec checks against a hand-walked graph.
  *
  * Plan shape per round: one equi-join frontier⋈edges on `src`, one
  * distinct on the successor set, one anti-join against visited —
  * all keyed by vertex id, nothing driver-side. The edge list is the
  * corpus-sized frame: callers persist it pre-partitioned by `src`
  * once (same note as PageRank) and every round shuffles only the
  * frontier — at 100 TB that is the working set of newly reached
  * ids, not the graph. `visited` and `frontier` persist per round
  * with the stale round released; past the [[Iterate]] cadence the
  * level list collapses into one localCheckpoint leaf, so neither
  * lineage nor the analyzed plan grows with `maxHops`.
  * The per-round emptiness gate is one count action on the FRONTIER
  * (the small frame), mirroring KCore.peelToFixpoint's count-gating;
  * early exit cannot change the result — an empty frontier stays
  * empty forever.
  */
object Bfs {

  /** Minimum hops (≤ `maxHops`) from any row of `sources` (col `id`)
    * over `edges` (cols `src`, `dst`, directed — union the reverse
    * for undirected graphs). Returns (id, hops); unreachable nodes
    * are absent, sources themselves carry hops 0.
    *
    * CACHE DISCIPLINE — each BFS level persists as its OWN frame and
    * NOTHING unpersists until the caller's `releaseAll()`: a
    * mid-loop `unpersist()` of a parent makes Spark's CacheManager
    * re-compile every dependent cache entry, DISCARDING its
    * materialized buffers (uncache cascades a lazy recache), so an
    * unpersist-as-you-go visited chain re-derives its whole union
    * lineage every round — measured 1.9 s → 3.7 s → 14.2 s across
    * rounds 2–4 on the sf0.01 co-purchase graph before this
    * restructure, 39 s total vs ~11 s after. Total cache stays O(V):
    * every reached node is stored in exactly one level. */
  /** @param exhaustCheck when true (default), run one `isEmpty`
    * action per round and stop as soon as a frontier empties — the
    * right mode when `maxHops` far exceeds the expected diameter.
    * When false the loop plans exactly `maxHops` rounds with no
    * per-round emptiness action; an empty frontier just yields empty
    * levels (a no-op in the result by construction). NOTE the
    * [[Iterate]] cadence still fires its eager collapse jobs in this
    * mode — set `spark.graft.iterate.checkpointEvery=0` as well when
    * construction must stay fully job-free. Fixed small-budget
    * callers want false: each
    * per-round action costs a full AQE re-plan of the growing
    * union+anti-join chain, and that DRIVER time dominated the n6
    * bench query (warm construct 7.4 s vs 4.3 s of actual job time;
    * ~34 jobs/pass from 4 checked rounds). */
  def minHops(edges: DataFrame, sources: DataFrame,
    maxHops: Int, exhaustCheck: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
    // levels(h) = nodes first reached at hop h, newest first
    var levels = List(Broadcasting.track(
      sources.select(col("id")).distinct()
        .withColumn("hops", lit(0)).persist()))
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      val frontier = levels.head.select("id")
      val visited = levels.map(_.select("id")).reduce(_ unionAll _)
      val next = Broadcasting.track(
        frontier.join(e, frontier("id") === e("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .withColumn("hops", lit(h))
          .persist())
      // the round's one action (on the FRONTIER, the small frame)
      if (exhaustCheck && next.isEmpty) exhausted = true
      else levels ::= next
      // LINEAGE CUT (Iterate doc): every level embeds every earlier
      // one twice (frontier + visited), so the analyzed tree doubles
      // per round. Past the cadence, collapse the whole list into ONE
      // materialized leaf and re-split it by the hops column — same
      // rows (levels are disjoint by the anti-join invariant), but
      // round h+1 plans against two filters of a LogicalRDD instead
      // of the full history. h < maxHops: the collapse only pays for
      // itself if a LATER round plans against the leaf — on the final
      // round it would be a pure wasted materialization job (same
      // guard as PageRank's i < iters). r22 note: skipping the cut
      // when only ONE round remains (h + 1 < maxHops, the r21
      // cadence-4 hypothesis from n6's 3.4→2.7 s) was A/B'd twice
      // interleaved at sf0.1 and measured a wash (0.99×, 0.98×) while
      // doubling the final plan's printed size past the n6 pin — the
      // r21 delta was FS-regime noise, so the simpler cadence guard
      // stays.
      if (!exhausted && h < maxHops && Iterate.due(spark, h))
        levels = Iterate.collapseByHops(levels, h)
    }
    levels.reduce(_ unionAll _)
  }

  /** Per-source variant: minimum hops from EACH source separately —
    * (origin, id, hops), the bounded transitive closure that SPARQL
    * property paths (`p{1,n}` between two variables) compile to.
    * Same frontier/visited algorithm keyed by (origin, id) instead
    * of id, same cache discipline, same `exhaustCheck` trade-off.
    *
    * `seedReached` picks the two path semantics for the ORIGIN:
    *  - true (default): the origin counts as reached at hops 0
    *    (`p*`-style reachability) — a cycle back to the origin is
    *    never re-admitted, its minimum is the zero-length path.
    *  - false: only EDGE TRAVERSALS reach nodes (`p+`-style): seeds
    *    seed round 1's frontier but are absent from the output and
    *    from the round-1 visited set, so a cycle re-reaches its
    *    origin at the cycle length (x→y→x emits (x, x, 2)).
    *
    * Cost is honest closure cost: O(Σ_s reachable≤n(s)) rows, not
    * O(V) — per-round frames carry one row per (source, newly
    * reached node). Bounded `maxHops` is the scale contract; an
    * unbounded `p+` over a high-expansion graph is a data explosion
    * by definition, not a plan defect. */
  def minHopsPerSource(edges: DataFrame, sources: DataFrame,
    maxHops: Int, exhaustCheck: Boolean = true,
    seedReached: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val e = edges.select(col("src"), col("dst"))
    val seed = Broadcasting.track(
      sources.select(col("id")).distinct()
        .select(col("id").as("origin"), col("id"))
        .withColumn("hops", lit(0)).persist())
    // levels(h) = (origin, node first reached from origin at hop h);
    // under seedReached=false the seed is frontier-only and excluded
    var levels = List(seed)
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      val frontier = levels.head.select("origin", "id")
      val reached = (if (seedReached) levels
        else levels.filterNot(_ eq seed)).map(_.select("origin", "id"))
      val expanded = frontier.join(e, frontier("id") === e("src"))
        .select(col("origin"), col("dst").as("id")).distinct()
      val deduped = // round 1 of p+ mode has nothing reached yet
        if (reached.isEmpty) expanded
        else expanded.join(reached.reduce(_ unionAll _),
          Seq("origin", "id"), "left_anti")
      val next = Broadcasting.track(
        deduped.withColumn("hops", lit(h)).persist())
      if (exhaustCheck && next.isEmpty) exhausted = true
      else levels ::= next
      // lineage cut, same rationale/mechanics as minHops. The p+
      // seed is identity-tracked (`_ eq seed`): keep it OUT of the
      // leaf and carry the object through, so its exclusion from
      // `reached` and from the output keeps working by reference
      // (seed rows never enter the leaf — frontier-only by contract).
      // h < maxHops: skip the eager collapse when no later round
      // exists to plan against the leaf (minHops has the same guard).
      if (!exhausted && h < maxHops &&
          Iterate.due(edges.sparkSession, h)) {
        val fold =
          if (seedReached) levels else levels.filterNot(_ eq seed)
        if (fold.nonEmpty)
          levels = Iterate.collapseByHops(fold, h) :::
            (if (seedReached) Nil else levels.filter(_ eq seed))
      }
    }
    val out = if (seedReached) levels else levels.filterNot(_ eq seed)
    if (out.isEmpty) seed.filter(lit(false)) // maxHops 0, p+ mode
    else out.reduce(_ unionAll _)
  }

  /** Rounds the doubling closure needs: ⌈log₂ maxHops⌉ (spec-pinned;
    * span after round r is 2^r, stop once it covers maxHops). */
  def doublingRounds(maxHops: Int): Int =
    if (maxHops <= 1) 0
    else 32 - Integer.numberOfLeadingZeros(maxHops - 1)

  /** Depth past which [[allPairsMinHops]] routes to the doubling
    * closure. The trade at the all-pairs shape (source set ≈ node
    * set): a frontier round joins only the newest level against the
    * STATIC edge list, a squaring round joins the whole bounded
    * distance relation with itself — cheaper rounds vs fewer rounds
    * (maxHops vs ⌈log₂ maxHops⌉). At depth ≤ 4 the round-count gap
    * is ≤ 2 and frontier's lighter joins win; past it the gap grows
    * as n − log₂ n and the per-round fixed cost — an AQE re-plan of
    * a growing union+anti-join chain per round, the measured n6
    * driver bottleneck — dominates. Heuristic constant, same
    * tuned-then-pinned status as TopKRewrite's crossover. */
  val DoublingCrossover = 4

  /** The [[allPairsMinHops]] route decision, exposed so specs and
    * plans can assert which regime a depth lands in. */
  def routesToDoubling(maxHops: Int): Boolean =
    maxHops > DoublingCrossover

  /** Bounded min-hop closure for the ALL-PAIRS shape — the SPARQL
    * `?x p{m,n} ?y` compilation target, where `sources` is (nearly)
    * the node set and the frontier walk degenerates to all-pairs
    * anyway. ONE decision point: shallow windows walk frontiers
    * (exhaustCheck=false — the fixed-budget mode), deep windows run
    * the ⌈log₂ n⌉-round doubling closure. Identical output either
    * way (spec-pinned on the n7 fixture and on random graphs); keep
    * calling [[minHopsPerSource]] directly for FEW-source
    * blast-radius queries over big graphs, where all-pairs would be
    * a data explosion regardless of depth. */
  def allPairsMinHops(edges: DataFrame, sources: DataFrame,
    maxHops: Int, seedReached: Boolean = true): DataFrame =
    if (routesToDoubling(maxHops))
      minHopsDoubling(edges, sources, maxHops, seedReached)
    else
      minHopsPerSource(edges, sources, maxHops, exhaustCheck = false,
        seedReached = seedReached)

  /** [[minHopsPerSource]] by PATH DOUBLING (iterated min-plus
    * squaring): identical output — (origin, id, hops), both
    * `seedReached` modes — in ⌈log₂ maxHops⌉ rounds instead of
    * maxHops. Each round joins the bounded all-pairs distance
    * relation with itself (dist₂ₖ(a,c) = min(distₖ(a,c), min over m
    * of distₖ(a,m)+distₖ(m,c)); any walk of length ≤ 2k splits at
    * its midpoint into two walks ≤ k, so the recurrence is exact for
    * every pair INCLUDING closed walks — which is what keeps p+'s
    * cycle-back-to-origin semantics: dist(s,s) is the shortest
    * closed walk through s, exactly what the frontier algorithm
    * reports). Composed hops above `maxHops` prune each round (safe:
    * a surviving walk's halves are ≤ ⌈L/2⌉ ≤ maxHops).
    *
    * The trade vs the frontier walk is explicit: this closure is
    * ALL-PAIRS over the edge set — per-round cost does not shrink
    * to the sources' reach. Right when the sources ARE (nearly) the
    * node set — the SPARQL `?x p{m,n} ?y` shape, where the frontier
    * algorithm degenerates to all-pairs anyway but pays maxHops
    * rounds of it — and when deep `n` makes round count the driver
    * bottleneck ([[Iterate]] cuts apply here too, on the log-many
    * rounds). Keep [[minHopsPerSource]] for few-source blast-radius
    * queries over big graphs, where all-pairs would be a data
    * explosion. */
  def minHopsDoubling(edges: DataFrame, sources: DataFrame,
    maxHops: Int, seedReached: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val spark = edges.sparkSession
    val seed = sources.select(col("id")).distinct()
    val seed0 = seed.select(col("id").as("origin"), col("id"),
      lit(0).as("hops"))
    if (maxHops == 0)
      return if (seedReached) seed0 else seed0.filter(lit(false))
    var dist = Broadcasting.track(
      edges.select(col("src"), col("dst")).distinct()
        .withColumn("hops", lit(1)).persist())
    val rounds = doublingRounds(maxHops)
    for (r <- 1 to rounds) {
      val fst = dist.select(col("src"), col("dst").as("mid"),
        col("hops").as("h1"))
      val snd = dist.select(col("src").as("mid"), col("dst"),
        col("hops").as("h2"))
      val squared = fst.join(snd, "mid")
        .select(col("src"), col("dst"),
          (col("h1") + col("h2")).as("hops"))
        .filter(col("hops") <= maxHops)
      val step = dist.unionAll(squared)
        .groupBy(col("src"), col("dst")).agg(min(col("hops")).as("hops"))
      dist = // r < rounds: no eager cut when no later round reads it
        if (r < rounds && Iterate.due(spark, r)) Iterate.cut(step)
        else Broadcasting.track(step.persist())
    }
    val reached = dist
      .join(seed.select(col("id").as("src")), Seq("src"), "left_semi")
      .select(col("src").as("origin"), col("dst").as("id"), col("hops"))
    if (seedReached)
      // the origin's minimum is the zero-length path; a closed walk
      // back to it must not re-admit it at the walk length
      seed0.unionAll(reached.filter(col("origin") =!= col("id")))
    else reached
  }

  /** EXACT-length reachability: (origin, id, hops) pairs connected by
    * SOME walk whose length falls in [minHops, maxHops], with `hops`
    * the smallest in-window length. Differs from
    * [[minHopsPerSource]] when `minHops ≥ 2`: there, a pair whose
    * SHORTEST path is 1 never surfaces even if a longer in-window
    * walk exists (min-hop semantics); here per-length frontiers run
    * WITHOUT the cross-level visited dedup, so `a→b` plus `a→c→b`
    * yields (a, b, 2) for the window [2, 2] — the SPARQL `p{m,n}`
    * contract. Cost: each length-ℓ frontier is bounded by
    * O(sources × nodes) rows (walks revisit nodes; cycles do not
    * loop the DRIVER — `maxHops` bounds the rounds), which is why
    * [[minHopsPerSource]] remains the right plan whenever
    * `minHops ≤ 1`, where the two semantics provably agree. */
  def lengthWindow(edges: DataFrame, sources: DataFrame,
    minHops: Int, maxHops: Int): DataFrame = {
    require(1 <= minHops && minHops <= maxHops,
      s"need 1 <= minHops <= maxHops: $minHops/$maxHops")
    val e = edges.select(col("src"), col("dst"))
    var cur = Broadcasting.track(
      sources.select(col("id")).distinct()
        .select(col("id").as("origin"), col("id")).persist())
    var inWindow = List.empty[DataFrame]
    for (h <- 1 to maxHops) {
      val nxt = cur.join(e, cur("id") === e("src"))
        .select(col("origin"), col("dst").as("id")).distinct()
      // lineage cut on the cadence (Iterate doc): localCheckpoint
      // both persists (what the else-branch persist() did) and
      // resets `cur`'s plan to a leaf, so the final union's tree —
      // one cur-subtree per window length — stays bounded for wide
      // windows instead of nesting maxHops joins deep.
      cur = // h < maxHops: the final round's frame is read once by
        // the window union — an eager cut there is a wasted job
        if (h < maxHops && Iterate.due(edges.sparkSession, h))
          Iterate.cut(nxt)
        else Broadcasting.track(nxt.persist())
      if (h >= minHops)
        inWindow ::= cur.withColumn("hops", lit(h))
    }
    inWindow.reduce(_ unionAll _)
      .groupBy(col("origin"), col("id"))
      .agg(min(col("hops")).as("hops"))
  }
}
