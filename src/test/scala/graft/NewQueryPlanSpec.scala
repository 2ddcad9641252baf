package graft

/** Physical-plan guards for the round-10 query additions: the shapes
  * that make them scale must survive optimizer/AQE changes. */
class NewQueryPlanSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("g7 spatial join is the grid equi-join, never a cross join") {
    val p = plan("g7_grid_pip_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j13 fuzzy self-join never forms the n² cross join") {
    val p = plan("j13_fuzzy_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("w8 rolling window is partitioned by customer (no global sort window)") {
    val p = plan("w8_rolling_spend")
    assert(p.contains("Window"), p)
    // a Window with an empty partition spec would be a single-task
    // global sort; the customer key must appear in the window's
    // partition clause
    assert(p.contains("partitionBy") || // plan string variants
      "windowspecdefinition\\(o_custkey".r.findFirstIn(p.toLowerCase)
        .isDefined, p)
  }

  test("t4 funnel census carries one user-keyed window shuffle") {
    val p = plan("t4_funnel_paths")
    assert("windowspecdefinition\\(user_id".r
      .findFirstIn(p.toLowerCase).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q4 EXISTS is a semi-join with the date filter at the scan") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q7/q14/q19: dims broadcast, fact scanned once, no cross joins") {
    Seq("q7_volume_shipping", "q14_promo_revenue",
      "q19_bracket_predicates").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
    // q7/q14's ship-date windows must reach the lineitem scan
    assert(plan("q7_volume_shipping")
      .contains("PushedFilters: [IsNotNull(l_shipdate)"),
      plan("q7_volume_shipping"))
  }

  test("q18 top-20 is TakeOrdered over the HAVING survivors, no global sort") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q15/q22 scalar subqueries broadcast; q22's NOT EXISTS is an anti-join") {
    val p15 = plan("q15_top_supplier")
    assert(p15.contains("BroadcastHashJoin") ||
      p15.contains("BroadcastNestedLoopJoin"), p15)
    assert(!p15.contains("CartesianProduct"), p15)
    val p22 = plan("q22_idle_balances")
    assert(p22.contains("LeftAnti"), p22)
    assert(!p22.contains("CartesianProduct"), p22)
  }

  test("q2 decorrelated min join-back is keyed, dims broadcast, no cartesian") {
    val p = plan("q2_min_cost_supplier")
    // the correlated scalar subquery must become a KEYED join of the
    // two part-cardinality frames (SMJ or shuffled/broadcast hash),
    // never a nested-loop or cartesian evaluation per row
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p) // part/supplier dims
  }

  test("q20 EXISTS chain: outer is a left semi, no cartesian anywhere") {
    val p = plan("q20_nested_exists")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21 double correlation is a semi + anti pair on the order key") {
    val p = plan("q21_waiting_suppliers")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q11/q13/q16/q17: decorrelated joins, dims broadcast, no cartesian") {
    Seq("q11_important_parts", "q13_order_count_distribution",
      "q16_supplier_part_types", "q17_small_quantity_revenue")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
        // q11's 1-row total is the only legitimate nested-loop: a
        // broadcast single-row scalar join (the q15 spelling)
        if (q != "q11_important_parts")
          assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      }
    // q16's NOT IN must be the anti join, not a filter re-scan
    assert(plan("q16_supplier_part_types").contains("LeftAnti"))
    // q17's correlated average is a keyed join-back of the part-sized
    // aggregate — SMJ or shuffled hash, either is keyed
    val p17 = plan("q17_small_quantity_revenue")
    assert(p17.contains("SortMergeJoin") || p17.contains("ShuffledHashJoin")
      || p17.contains("BroadcastHashJoin"), p17)
  }

  test("q8/q9/q12: dims broadcast, one fact pass, no cartesian") {
    Seq("q8_market_share", "q9_product_profit", "q12_delay_priority")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
        assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      }
    // q8's market membership is a semi-join, not a dim expansion
    assert(plan("q8_market_share").contains("LeftSemi"))
  }

  test("x21 vocabulary joins back as a broadcast, cutoff via TakeOrdered") {
    val p = SparkEntry.queries("x21_vocab_coverage")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("a21 skyline: calendar-sized window, keyed join-back, no n² scan") {
    val p = plan("a21_skyline")
    // the oracle's n² dominance scan must NOT be the engine plan
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // running max over the per-date frame + equi-join back
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("SortMergeJoin"), p)
  }

  test("g8 radius NN: grid equi-join with explode, never the n² cross join") {
    val p = plan("g8_radius_nn")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate explode"), p) // the 9-cell probe fan-out
  }

  test("t7 cohorts plan carries no window; t8's window is user-keyed") {
    // t7's design claim: distinct + min + keyed join, NO window and
    // no day-grid explode
    val p7 = plan("t7_retention_cohorts")
    assert(!p7.contains("Window"), p7)
    assert(!p7.contains("Generate"), p7)
    // t8 lags within the user partition — a global sort window here
    // would be the single-task scale-killer
    val p8 = plan("t8_transition_matrix")
    assert("windowspecdefinition\\(user_id".r
      .findFirstIn(p8.toLowerCase).isDefined, p8)
  }

  test("s12 ORC re-read prunes to the aggregated columns") {
    val p = plan("s12_orc_roundtrip")
    // the 3-column ORC file is read back for a 2-column aggregate;
    // o_orderkey must not survive into the scan schema
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(p).toList
      .filter(_.contains("orderstatus"))
    assert(readSchemas.nonEmpty, p)
    assert(readSchemas.forall(!_.contains("o_orderkey")), readSchemas)
  }

  test("n6 BFS result reads cached levels, no cartesian anywhere") {
    try {
      val p = plan("n6_bfs_hops")
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      // post-cut plan shape (Iterate doc): the collapsed prefix reads
      // as a lineage-free RDD leaf, the last level from its cache
      assert(p.contains("Scan ExistingRDD"), p)
      assert(p.contains("InMemoryTableScan"), p)
    } finally graft.operators.Broadcasting.releaseAll()
  }

  test("n10 doubling closure: keyed joins only, leaf-cut rounds") {
    try {
      val p = plan("n10_order_chain")
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      // the min-plus square joins on the midpoint — an equi-join.
      // maxHops=8 is 3 doubling rounds and the cadence lands on the
      // FINAL one, where the r14 guard correctly SKIPS the eager cut
      // (no later round reads the leaf — the Bfs h<maxHops rule): the
      // last round is cache-fed, not checkpoint-fed
      assert(p.contains("InMemoryRelation"), p)
      assert(!p.contains("Scan ExistingRDD"), p)
      // exactly one window (the per-customer chain ranking) feeds the
      // edge build; the closure itself must not sort globally
      assert(!p.toLowerCase.contains(
        "windowspecdefinition()"), p) // no empty-partition window
      // …and a budget DEEPER than the cadence still cuts mid-loop:
      // 32 hops = 5 rounds, cut due at round 3, rounds 4-5 plan
      // against the materialized leaf
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
        .toDF("src", "dst")
      val deep = graft.operators.Bfs.minHopsDoubling(edges,
        edges.select(org.apache.spark.sql.functions.col("src")
          .as("id")), maxHops = 32)
      val dp = deep.queryExecution.executedPlan.toString
      assert(dp.contains("Scan ExistingRDD"),
        s"mid-loop cut missing from the deep closure:\n$dp")
    } finally graft.operators.Broadcasting.releaseAll()
  }

  test("x25 budget fill windows per source — never a global sort") {
    val p = plan("x25_budget_fill")
    assert("windowspecdefinition\\(source".r
      .findFirstIn(p.toLowerCase).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d6c/d4c capped pair generators run through the GroupedTopK heap") {
    try {
      Seq("d6c_simhash_capped", "d4c_lsh_capped").foreach { q =>
        val p = plan(q)
        assert(p.contains("GroupedTopK"), s"$q:\n$p")
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      }
    } finally graft.operators.Broadcasting.releaseAll()
  }
}
