package graft

/** Suite-wide physical-plan lints over EVERY query in the driver
  * registry — scale hazards caught the round they appear instead of
  * in a manual plan audit. (Per-query shape guards live in
  * NewQueryPlanSpec; this is the registry-wide floor.)
  */
class PlanLintSpec extends SparkTestBase {

  /** One plan build per query, shared by every lint in this suite. */
  private lazy val plans: Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, build) =>
      val plan =
        try build(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        finally graft.operators.Broadcasting.releaseAll()
      name -> plan
    }

  test("no registered query plans a CartesianProduct") {
    // the suite's deliberate tiny cross joins (teleport N, scalar
    // aggregates, k-row codebooks) are all spelled
    // crossJoin(broadcast(...)) -> BroadcastNestedLoopJoin; any
    // CartesianProduct is a real corpus×corpus product
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"CartesianProduct planned by: ${offenders.mkString(", ")}")
  }

  /** The in-bucket all-pairs generator's plan fingerprint
    * (MinHashLsh.bucketPairs: named_struct('a', element_at(xs, i),
    * 'b', y) under nested transforms). */
  private val PairExplodeFingerprint = "named_struct(a, element_at("

  // Queries ALLOWED to explode pairs within buckets, each with its
  // bound. The d-ladder measured the hazard this lint guards: an
  // UNCAPPED all-pairs explode inside hot buckets went ×26 wall at a
  // 10× near-dup-heavy corpus (d6 vs its capped twin d6c — BASELINE
  // .md r13); a new query reusing bucketPairs without a cap or a
  // structural bound must be added HERE with its rationale, not
  // slipped in silently.
  private val BoundedPairExplodes: Map[String, String] = Map(
    "d2_ngram_jaccard" -> ("buckets filtered to size <= dfCap before " +
      "the explode (stop-shingle ceiling)"),
    "d4_lsh_pairs" -> ("uncapped IS the semantic contract (exact LSH " +
      "candidates); d4c is the measured scale lever"),
    "d4c_lsh_capped" -> "GroupedTopK bucket cap bounds buffer + pairs",
    "d6_simhash_pairs" -> ("uncapped IS the semantic contract (all " +
      "pairs within hamming buckets); d6c is the measured lever"),
    "d6c_simhash_capped" -> "GroupedTopK bucket cap (r13 ladder: ×1.5 at 10×)",
    "d13_minhash_accuracy" -> ("pair set = d4's LSH candidates " +
      "(accuracy eval must see exactly those pairs)"),
    "v7_semantic_dedup" -> ("16-bit hyperplane band buckets ~ near-dup " +
      "families; the capped-LSH levers apply if a corpus breaks this"),
    "d7_dedup_apply" -> ("dedup groups over d4's LSH candidates — " +
      "same band-bucket contract; candidatePairs(bucketCap=...) is " +
      "the lever"),
    "d8_dedup_groups" -> "same LSH candidate machinery as d7",
    "d11_containment" -> "same LSH candidate machinery as d7",
    "d12_canonical_pick" -> "same LSH candidate machinery as d7",
    "x19_leakage_split" -> "same LSH candidate machinery as d7",
    "c6_curation_pipeline" -> ("near-dup stage reuses the LSH " +
      "candidate machinery (d7 contract)"),
    "n1_pagerank" -> "order buckets: TPC-H orders hold <= 7 parts",
    "n9_ppr" -> "order buckets: TPC-H orders hold <= 7 parts",
    "n3_triangles" -> "order buckets: TPC-H orders hold <= 7 parts")

  // Same order-bucket bound, but their edge build hides behind an
  // eager cut / persist (Iterate's checkpoint leaf), so the
  // fingerprint cannot see it in the final plan — exempt from the
  // staleness check, documented here instead.
  private val HiddenBehindCut = Set("n4_kcore", "n6_bfs_hops")

  test("pairs-within-bucket explodes appear ONLY in queries with a " +
    "recorded bound or cap") {
    val exploders = plans.collect {
      case (name, plan) if plan.contains(PairExplodeFingerprint) => name
    }.toSet
    val unvetted = exploders -- BoundedPairExplodes.keySet
    assert(unvetted.isEmpty,
      s"unvetted pairs-within-bucket explode in: ${unvetted.mkString(", ")} " +
        "— cap it (GroupedTopK bucket cap / dfCap) or record its " +
        "structural bound in BoundedPairExplodes")
    // keep the allowlist honest: an entry whose query stopped
    // exploding (or left the registry) is stale documentation
    val stale = BoundedPairExplodes.keySet -- exploders -- HiddenBehindCut
    assert(stale.isEmpty,
      s"BoundedPairExplodes entries no longer exploding: ${stale.mkString(", ")}")
  }
}
