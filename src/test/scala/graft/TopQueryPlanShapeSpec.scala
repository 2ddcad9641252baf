package graft

/** Executed-plan fingerprints for the bench's top-10 most expensive
  * queries (r19 verdict ask #5; ranking from BENCH_r19.json's
  * centisecond tail: n9 n10 c6 n6 n4 n1 v15 v13 d6 x19).
  *
  * PlanLintSpec asserts registry-wide ANTI-pattern absence; this
  * suite pins shape PRESENCE for the queries whose plans carry the
  * bench: the persisted-edge scans, the lineage-cut leaves, the
  * window stages, the broadcast joins — plus an Exchange ceiling
  * with ~1.3× headroom over the audited r20 plan, so a silent plan
  * regression (a lost broadcast, a lineage cut dropped, an iterative
  * loop doubling its shuffles) fails the suite BEFORE the bench
  * drifts. Plans are built (never executed) at sf0.001, the same
  * environment every round's audit used; counts are deterministic
  * for fixed data + confs.
  *
  * If a DELIBERATE plan change trips a ceiling, re-audit the query
  * (explain + bench A/B), then move the pin WITH the audit note —
  * that is the pin doing its job, not an obstacle.
  */
class TopQueryPlanShapeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    try SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    finally graft.operators.Broadcasting.releaseAll()

  private def exchanges(p: String): Int =
    "(?<!Reused)Exchange".r.findAllIn(p).length

  /** Common floor for every pinned query. */
  private def common(name: String, p: String): Unit = {
    assert(!p.contains("CartesianProduct"),
      s"$name plans a CartesianProduct")
  }

  private case class Pin(name: String, maxExchanges: Int,
    floors: Map[String, Int])

  // audited r20 plan features (PlanDump, sf0.001):
  //   n9 ex=66 bhj=10 inmem=10 | n1 ex=60 bhj=6 inmem=12
  //   n10 ex=89 win=2 inmem=24 | c6 ex=12 bhj=4 win=2
  //   n6 ex=4 rdd=6 | n4 ex=2 rdd=2
  //   v15 ex=50 bhj=5 win=8 | v13 ex=48 bhj=4 win=8
  //   d6 ex=5 | x19 ex=222 inmem=67
  private val pins = Seq(
    // iterative (id, rank) shuffles over persisted, deduped edges —
    // the InMemoryTableScan leaves ARE the persist discipline
    Pin("n9_ppr", 80, Map(
      "InMemoryTableScan" -> 1, "BroadcastHashJoin" -> 1)),
    Pin("n1_pagerank", 75, Map(
      "InMemoryTableScan" -> 1, "BroadcastHashJoin" -> 1)),
    // chain windows partitioned per customer + persisted edge frames
    Pin("n10_order_chain", 110, Map(
      "Window" -> 1, "InMemoryTableScan" -> 1)),
    // the single-frame flag plan: LOW exchange count is the shape
    Pin("c6_curation_pipeline", 16, Map(
      "Window" -> 1, "BroadcastHashJoin" -> 1)),
    // Iterate's localCheckpoint lineage cut shows as ExistingRDD
    // leaves — losing the cut regrows the full iterative lineage
    Pin("n6_bfs_hops", 6, Map("Scan ExistingRDD" -> 1)),
    Pin("n4_kcore", 3, Map("Scan ExistingRDD" -> 1)),
    // IVF/PQ two-stage — RE-AUDITED r21 (PinAudit, sf0.001): the
    // k-means fits now localize centroids per round and assign via a
    // narrow codegen argmin over ONE persisted quantized corpus pass
    // (KMeans.fitE6Local), so the seeding windows and the per-
    // assignment corpus shuffles are gone: v15 ex 50→13 win 8→0,
    // v13 ex 48→11 win 8→0 (bench v13 2.6→1.6 s, v15 3.8→1.3 s,
    // shuffle 4.13→0.07 MB at sf0.1). New load-bearing shape: the
    // shared quantized InMemoryTableScan + the codebook/LUT
    // broadcast joins.
    Pin("v15_ivfpq_rerank", 17, Map(
      "BroadcastHashJoin" -> 1, "InMemoryTableScan" -> 1)),
    Pin("v13_ivfpq_search", 15, Map(
      "BroadcastHashJoin" -> 1, "InMemoryTableScan" -> 1)),
    // hamming-bucket blocking: a handful of bucket shuffles, and the
    // in-bucket pair explode IS the semantic contract (PlanLintSpec
    // records its bound)
    Pin("d6_simhash_pairs", 8, Map(
      "named_struct(a, element_at(" -> 1)),
    // span-hash inverted index over persisted shingle frames.
    // RE-AUDITED r21 (PinAudit): ex 222→414 is STRING-metric
    // inflation, not new shuffles — the r21 persists (query-level
    // `split`, CC's one-directional edge frame) nest more
    // InMemoryRelation subtrees into the printed plan, each carrying
    // its cached child's exchanges (inmem 70→166); the bench's
    // runtime shuffle tally for x19 is unchanged (266→260 files,
    // 0.51 MB before and after).
    Pin("x19_leakage_split", 540, Map("InMemoryTableScan" -> 1)))

  pins.foreach { pin =>
    test(s"${pin.name}: plan shape pinned (exchanges <= " +
      s"${pin.maxExchanges}, load-bearing operators present)") {
      val p = plan(pin.name)
      common(pin.name, p)
      val ex = exchanges(p)
      assert(ex <= pin.maxExchanges,
        s"${pin.name}: $ex exchanges > ceiling ${pin.maxExchanges} — " +
          "a plan regression (or a deliberate change needing a " +
          "re-audit; see the suite scaladoc)\n" + p.take(4000))
      pin.floors.foreach { case (op, n) =>
        val count = p.sliding(op.length).count(_ == op)
        assert(count >= n,
          s"${pin.name}: expected >= $n of '$op', found $count — the " +
            "load-bearing operator vanished\n" + p.take(4000))
      }
    }
  }
}
