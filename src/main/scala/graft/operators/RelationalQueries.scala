package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.plans.GroupedTopK
import graft.sources.Layout

/** Relational operator coverage for SURVEY.md §2, re-expressed over the
  * driver's TPC-H-ish testdata and verified against a DuckDB oracle.
  *
  * Conventions (driver compare is schema+hash exact):
  *   - every aggregate / computed column is aliased identically in the
  *     Spark plan and the oracle SQL;
  *   - double aggregations are rounded (sum order is not associative);
  *   - results carry an ORDER BY on a unique key set;
  *   - integer-ish derived columns are cast to BIGINT on both sides.
  *
  * Scale notes (100 TB design point) are in each query's comment.
  */
object RelationalQueries {
  /** Per-JVM scratch-path token for s12's ORC round-trip: constant
    * within a JVM (re-runs overwrite, no FS debt) yet distinct across
    * concurrently-running JVMs (no cross-session scratch races). The
    * shutdown hook deletes this JVM's scratch dirs — without it every
    * bench/verify JVM would leave an ORC copy of orders in tmpdir,
    * exactly the accumulating debt the deterministic path avoids. */
  private lazy val orcScratchToken: String = {
    val tok = java.util.UUID.randomUUID().toString.take(8)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"graft_orc_$tok"))
        .foreach(rm)
    }))
    tok
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A-class aggregations -------------------------------------------
    // TPC-H Q1 shape (SURVEY A2/A5): partial+final hash agg, one shuffle on
    // the 2-key group; scan prunes to 6 columns and pushes the date filter.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          // integer cents per row then an associative integer sum —
          // order-free (a rounded double sum hinges on partial-agg
          // order at the cent boundary); avg is safe as-is: one
          // division of an exact integer-valued sum
          sum(floor(col("l_extendedprice") * 100 + 0.5))
            .as("sum_base_e2"),
          sum(floor(col("l_extendedprice") *
            (lit(1) - col("l_discount")) * 100 + 0.5)).as("sum_disc_e2"),
          // floor(x*1e4+0.5), NOT round(x,4): Spark's round() HALF_UPs
          // the shortest decimal string while DuckDB rounds the binary
          // double — they can disagree at 4th-decimal midpoints. The
          // floor form computes bit-identically on both engines (the
          // file's f11 convention).
          (floor(avg("l_quantity") * 10000 + 0.5) / 10000.0)
            .as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // SURVEY A3: grouped counts (defaultdict(int) analog). Map-side combine
    // keeps the shuffle tiny regardless of fact size.
    "a3_group_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
        .filter(col("l_suppkey") < 20)
        .orderBy("l_suppkey")
    }),

    // SURVEY A4: exact distinct count per group (set-size analog).
    "a4_distinct_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // SURVEY A5: running totals / rate report analog over events.
    "a5_event_totals" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        // see q1: per-row cents keep the double sum order-free
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100 + 0.5)).as("total_value_e2"))
        .orderBy("event_type")
    }),

    // SURVEY A6/W4: per-group batch count, BATCH_SIZE=3 here (1000 in the
    // reference); `div` is TRUE integer division (the oracle's //) —
    // floor(a/b) detours through an IEEE double.
    "a6_batch_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
        .withColumn("n_batches", expr("(n_lines + 2) div 3"))
        .groupBy(col("n_lines"), col("n_batches"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("n_lines")
    }),

    // SURVEY A7: bounds aggregate (shapely .bounds analog) as min/max fold.
    "a7_bounds" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"))
        .orderBy("l_linestatus")
    }),

    // SURVEY A8: count_documents analog.
    "a8_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),

    // SURVEY A1: argmax (dominant element) with deterministic tie-break
    // (qty desc, orderkey asc, linenumber asc) — the reference's
    // strict-> first-max semantics. Expressed as max(struct(...)) with
    // negated tie-break keys: a partial+final hash agg instead of a
    // window sort — at 100 TB a window partitioned by a 3-value key is
    // 3 giant sorted partitions (pure skew); this shuffles 3 rows.
    "a1_argmax" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("l_quantity"),
          (-col("l_orderkey")).as("nk"),
          (-col("l_linenumber")).as("nl"))).as("m"))
        .select(col("l_returnflag"), col("m.l_quantity").as("l_quantity"),
          (-col("m.nk")).as("l_orderkey"),
          (-col("m.nl")).cast("int").as("l_linenumber"))
        .orderBy("l_returnflag")
    }),

    // Hierarchical totals via ROLLUP (free from Catalyst — the
    // reference folds dicts per level by hand). One expand + one agg.
    "a9_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Cube completes the grouping-set family (a9 is rollup): all four
    // (flag, status) granularities in ONE Expand pass, grouping_id
    // disambiguating which cell a row belongs to (PostgreSQL bitmask
    // semantics, first cube column = high bit — same as DuckDB's
    // GROUPING()).
    "a15_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Lag/lead neighbors over a unique total order per group.
    "w5_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          lag("l_quantity", 1).over(w).as("prev_qty"),
          lead("l_quantity", 1).over(w).as("next_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // Rolling time-RANGE window: each order's trailing-90-day spend
    // for the same customer (the feature-engineering staple — rolling
    // user activity). rangeBetween over integer epoch DAYS, so the
    // frame bound is exact and tie handling (all peers of an equal
    // order date share the frame) matches ANSI RANGE semantics in
    // both engines; integer cents keep the windowed sums exact. The
    // per-order frame is then folded to a per-priority census so the
    // result stays small. Plan at scale: ONE hash shuffle on
    // o_custkey for the window sort — per-customer state only, never
    // a global sort.
    "w8_rolling_spend" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"))
        .rangeBetween(-90, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("price_e2"))
        .withColumn("roll_e2", sum("price_e2").over(w))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum("roll_e2").as("sum_roll_e2"),
          max("roll_e2").as("max_roll_e2"))
        .orderBy("o_orderpriority")
    }),

    // Rolling z-score anomaly flags: orders more than 2 sample
    // standard deviations from their customer's trailing-2000-day mean
    // — the per-entity outlier census a spend/quality monitor runs.
    // NO float sqrt or division anywhere: z² > 4 cross-multiplies to
    //   (x·n − sum)²·(n−1)  >  4·n·(n·sumsq − sum²)
    // in DECIMAL(38,0) (the squared terms overflow int64 at cent
    // scale), so the flag is bit-identical on any engine with exact
    // decimals. Window sums stay int64 (price_e2² ≈ 3e15 × ≤30-row
    // windows < 9.2e18); only the comparison widens.
    "w10_rolling_zscore" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"))
        .rangeBetween(-2000, Window.currentRow)
      val dec = "decimal(38,0)"
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("price_e2"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum("price_e2").over(w))
        .withColumn("ss",
          sum(col("price_e2") * col("price_e2")).over(w))
        // n >= 6: the max sample z^2 over n points is (n-1)^2/n,
        // which first exceeds 4 (the 2-sigma test) at n = 6 — windows
        // with n <= 5 can never flag, so they'd only inflate
        // n_windows. The oracle mirrors the same bound.
        .filter(col("n") >= 6)
        .withColumn("dev",
          (col("price_e2") * col("n") - col("s")).cast(dec))
        .withColumn("is_outlier",
          col("dev") * col("dev") * (col("n") - 1).cast(dec) >
            lit(4).cast(dec) * col("n").cast(dec) *
              (col("n").cast(dec) * col("ss").cast(dec) -
                col("s").cast(dec) * col("s").cast(dec)))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("is_outlier"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("o_orderpriority")
    }),

    // Pivot (wide conditional aggregation) with an explicit value list
    // so the schema is static; missing combos coalesced to 0.
    "p14_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"))
        .orderBy("l_returnflag")
    }),

    // ---- S/P-class scans, projections, filters --------------------------
    // SURVEY S4/P1/P2: projection pruning — ReadSchema carries 3 columns.
    "s1_scan_prune" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_orderkey") < 100)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // SURVEY S3/F5: filename-derived metadata via input_file_name + regex.
    "s3_filename_meta" -> ((s, dir) => {
      t(s, dir, "region")
        .withColumn("stem",
          regexp_extract(input_file_name(), "([a-z]+)\\.parquet", 1))
        .groupBy(col("stem")).agg(count(lit(1)).as("cnt"))
    }),

    // SURVEY P3/S6: equality predicates pushed into the scan.
    "p3_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_custkey") < 100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // SURVEY P4: null/validity filter.
    "p4_null_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("props").isNotNull && col("value") > 0)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    // SURVEY P5: key-prefix predicate (prob_* analog).
    "p5_prefix_filter" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_name").startsWith("s"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),

    // SURVEY P6: class-membership filter (SNOMED-mapped classes analog).
    "p6_set_membership" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // SURVEY P9: split-arity guard (nucleustype >= 3 dot-parts analog).
    "p9_split_guard" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("n_parts", size(split(col("p_type"), " ")).cast("long"))
        .groupBy(col("n_parts")).agg(count(lit(1)).as("cnt"))
        .orderBy("n_parts")
    }),

    // SURVEY P11/W3: start-from (key-range restart) filter.
    "p11_start_from" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_name") >= "Customer#000000090")
        .select("c_custkey", "c_name")
        .orderBy("c_name")
    }),

    // SURVEY P13/F13: regex extraction predicate (slideId digits analog).
    "p13_regex_extract" -> ((s, dir) => {
      t(s, dir, "customer")
        .withColumn("cust_num",
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long"))
        .filter(col("cust_num") % 10 === 0)
        .select("c_custkey", "cust_num")
        .orderBy("c_custkey")
    }),

    // ---- J-class joins ---------------------------------------------------
    // SURVEY J1: small-dim lookup joins — explicitly broadcast; at 100 TB
    // the dims stay tiny so this never shuffles the fact table.
    "j1_broadcast_lookup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_cust"))
        .orderBy("r_name")
    }),

    // SURVEY J3: fact-to-fact equi-join on the natural key. At scale both
    // sides shuffle on l_orderkey/o_orderkey (or co-located via bucketing);
    // AQE picks broadcast when the filtered side collapses.
    "j3_fact_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),

    // SURVEY J4: enrichment join with fallback (negative-cache analog):
    // left join + coalesce to a synthetic value.
    "j4_enrich_coalesce" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation").filter(col("n_nationkey") < 10)
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"), "left")
        .withColumn("nation_name", coalesce(col("n_name"), lit("UNKNOWN")))
        .groupBy(col("nation_name")).agg(count(lit(1)).as("n_supp"))
        .orderBy("nation_name")
    }),

    // SURVEY J5/P12/E2: checkpoint ledger anti-join (work = universe − done).
    "j5_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // SURVEY J6/S5: $in-batch fetch as a semi-join.
    "j6_semi_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem").select(col("l_partkey").as("p_partkey"))
      p.join(l, Seq("p_partkey"), "left_semi")
        .agg(count(lit(1)).as("n_parts_with_lines"))
    }),

    // SURVEY J7: existence probe → missing flag (hal:missing analog).
    "j7_missing_flag" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_partkey")).distinct()
      p.join(l, p("p_partkey") === l("l_partkey"), "left")
        .withColumn("missing", col("l_partkey").isNull)
        .groupBy(col("missing")).agg(count(lit(1)).as("cnt"))
        .orderBy("missing")
    }),

    // Range join (equi key + interval predicate): lineitems shipped
    // within 90 days of their order date. Catalyst plans the equi part
    // as the join key and evaluates the range residually — at scale
    // the shuffle is still keyed, never a cross product.
    "j8_range_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= date_add(o("o_orderdate"), 90))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    }),

    // ---- W-class windows -------------------------------------------------
    // SURVEY W1: batch numbering within (group) — the reference's
    // batch_%06d assignment, BATCH_SIZE=3 stand-in.
    "w1_batch_number" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 50)
        .withColumn("rn0", row_number().over(w))
        .withColumn("batch", // true integer div, like the oracle's //
          expr("((rn0 - 1) div 3) + 1"))
        .select(col("l_orderkey"), col("l_linenumber"), col("batch"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // SURVEY W2: first-element-per-group selection (features[0] analog).
    "w2_first_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_date"))
        .orderBy("o_custkey")
    }),

    // Running total over a unique total order (deterministic fold).
    "w3_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 5)
        .withColumn("running_qty", sum("l_quantity").over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // Top-k per group (rank + filter), deterministic tie-break.
    "w4_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_custkey", "rnk")
    }),

    // Ranking windows: ntile buckets + exact-rational percent_rank /
    // cume_dist, integer-scaled for hash parity.
    "w6_ranking_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 60)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"),
          ntile(4).over(w).cast("long").as("quartile"),
          expr("cast(floor(percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber) * 1000000 + 0.5) as bigint)")
            .as("pr_e6"),
          expr("cast(floor(cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber) * 1000000 + 0.5) as bigint)")
            .as("cd_e6"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    }),

    // ---- E-class set operations ------------------------------------------
    // SURVEY E1: union + distinct (set-insert dedup).
    "e1_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(sup).distinct().orderBy("nationkey")
    }),

    // SURVEY E2: set difference.
    "e2_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("custkey"))
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("custkey"))
      // except IS set semantics already (dedups left, ignores right
      // multiplicity) — pre-distincting both sides paid two extra
      // aggregate+exchange stages for identical output
      c.except(o).orderBy("custkey")
    }),

    // BAG difference (EXCEPT ALL): multiplicity-aware reconciliation
    // — a key appearing 5 times in the fact and 3 times in the
    // reference survives twice, where set EXCEPT (e2) would erase
    // it. Spark's exceptAll plans this as count-tag + generate; the
    // census aggregates the surviving multiset so the result stays
    // small and ordered.
    "e4_except_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
      val sup = t(s, dir, "supplier")
        .select(explode(sequence(lit(1), lit(100)))
          .as("_i"), col("s_suppkey").as("k"))
        .select(col("k"))
      li.exceptAll(sup)
        .groupBy(col("k")).agg(count(lit(1)).as("surviving"))
        .orderBy("k")
    }),

    // Per-group MODE: the most frequent value, ties to the HIGHEST
    // value (a deterministic contract — arg_max tie order is
    // undefined in most engines, so the tie-break is explicit on
    // both sides). Two hash aggs: value counts, then the a1-style
    // argmax-of-struct — no window, no sort of the corpus.
    "a20_mode" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("cnt"), col("l_quantity"))).as("m"))
        .select(col("l_returnflag"),
          col("m.l_quantity").as("mode_qty"),
          col("m.cnt").as("mode_cnt"))
        .orderBy("l_returnflag")),

    // 2-D skyline (Pareto frontier): orders dominated by none —
    // earlier-or-same date AND higher-or-same price with one strict.
    // The naive spelling is an n² dominance scan (the oracle runs
    // exactly that, independently); the engine collapses to one
    // map-side-combined groupBy per DATE (calendar-bounded: ~2.4k
    // rows at ANY corpus size — a 100 TB orders table still has
    // ~2.4k distinct days), a running-max window over that
    // calendar-sized frame, and a broadcast join back. A same-date
    // point below its date's max is dominated by that max (strict
    // price); a date-max point is dominated iff an EARLIER date
    // reached ≥ its price (strict date) — so skyline = date-max
    // rows whose price strictly exceeds the prior running max.
    // Price ties on the frontier date all survive (no strict part).
    "a21_skyline" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val perDate = o.groupBy(col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("maxp"))
      val w = Window.orderBy(col("o_orderdate"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sky = perDate
        .withColumn("prevmax", max(col("maxp")).over(w))
        .filter(col("prevmax").isNull || col("maxp") > col("prevmax"))
        .select(col("o_orderdate").as("sky_date"),
          col("maxp"))
      o.join(sky, o("o_orderdate") === sky("sky_date") &&
          o("o_totalprice") === sky("maxp"))
        .select(o("o_orderkey"),
          date_format(o("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // SURVEY E-class: intersection (shared keys across two sets).
    "e3_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.intersect(sup).orderBy("k")
    }),

    // Array construction/sort/slice/indexing over split tokens.
    "f18_array_ops" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_partkey") < 40)
        .withColumn("words", split(col("p_name"), " "))
        .select(col("p_partkey"),
          size(col("words")).cast("long").as("n_words"),
          element_at(sort_array(col("words")), 1).as("first_sorted"),
          concat_ws("-", slice(col("words"), 1, 2)).as("head2"),
          array_position(col("words"),
            element_at(col("words"), -1)).cast("long").as("last_pos"))
        .orderBy("p_partkey")
    }),

    // Null-handling chain: nullif/coalesce/conditional defaults.
    "f19_null_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_or_open"),
          when(col("o_totalprice") > 200000, lit("big"))
            .when(col("o_totalprice") > 100000, lit("mid"))
            .otherwise(lit("small")).as("bucket"))
        .orderBy("o_orderkey")
    }),

    // ---- F-class scalar functions ------------------------------------
    // SURVEY F8: sha256 of a string id.
    "f8_sha2" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey") < 20)
        .select(col("c_custkey"), sha2(col("c_name"), 256).as("id_hash"))
        .orderBy("c_custkey")
    }),

    // SURVEY F10: UTC date formatting.
    "f10_date_format" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy(col("month")).agg(count(lit(1)).as("cnt"))
        .orderBy("month")
    }),

    // SURVEY F11: fixed-decimal formatting (%.2f analog). Half-up via exact
    // IEEE double arithmetic (floor(x*100+0.5)) so Spark's Java HALF_UP
    // formatter vs DuckDB's binary-value rounding can never diverge at
    // midpoints; the string is then built from integer cents.
    "f11_format_decimal" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 30)
        .withColumn("cents",
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        .select(col("l_orderkey"), col("l_linenumber"),
          format_string("%d.%02d", expr("cents div 100"), col("cents") % 100)
            .as("price_str"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // SURVEY F12: URI-tail extraction (split + last element).
    "f12_split_tail" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("type_tail", element_at(split(col("p_type"), " "), -1))
        .groupBy(col("type_tail")).agg(count(lit(1)).as("cnt"))
        .orderBy("type_tail")
    }),

    // SURVEY F13: regex replace (hash URN substitution analog).
    "f13_regex_replace" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey") < 20)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
        .orderBy("c_custkey")
    }),

    // SURVEY F15: JSON nested extraction (field_iip_path analog).
    "f15_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("k_mod", col("k") % 10)
        .groupBy(col("k_mod")).agg(count(lit(1)).as("cnt"))
        .orderBy("k_mod")
    }),

    // SURVEY F16: type coercions (Mongo ObjectId/Decimal cleanup analog).
    "f16_coercions" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 30)
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("line_no"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .orderBy("l_orderkey", "line_no")
    }),

    // Z-order layout: the Morton code driving Layout.writeZOrdered is
    // a pure integer function of (value, min, max) per column —
    // min/max-scale to 8-bit buckets (exact `div` arithmetic), then
    // interleave bits. The oracle replays the identical arithmetic, so
    // a hash match proves the clustering key a 100 TB rewrite would
    // range-partition on. (The write path itself is spec'd by
    // LayoutSpec's per-file spread assertions.)
    "p15_zorder_code" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 100)
      li.select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("line_no"),
        Layout.zCode(li, Seq("l_partkey", "l_suppkey"), bits = 8)
          .as("z"))
        .orderBy("l_orderkey", "line_no")
    }),

    // Skew toolkit end-to-end: the two-phase salted aggregation must
    // equal the direct groupBy for any associative aggregate — here
    // checked against the oracle's single-phase sum. (l_quantity is
    // integer-valued, so double summation is order-exact.) The salt is
    // a pure function of row content; see Skew.scala for why that
    // matters under stage retry.
    "a10_salted_agg" -> ((s, dir) =>
      Skew.saltedCountSum(t(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", saltBuckets = 8)
        .orderBy("l_returnflag")),

    // Skewed-join face of the toolkit: replicate the small side 8×,
    // salt the big side from row content, join on (key, salt) — a hot
    // key's rows spread over 8 reducers instead of one. Must equal the
    // plain equi-join; the oracle IS the plain join.
    "j12_salted_join" -> ((s, dir) => {
      val nations = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Skew.saltedJoin(t(s, dir, "lineitem"), nations, "l_suppkey",
        saltBuckets = 8, saltCols = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    // SURVEY S7: the generic external-enrichment operator (Enrich) run
    // end-to-end — distinct keys, per-task fetch with negative cache,
    // unforced join-back. The "service" is a deterministic function
    // (lower-case for even-length names, miss otherwise) so the DuckDB
    // oracle can impersonate it exactly; the machinery under test is
    // the real one a Drupal/REST fetcher would plug into.
    "s7_enrich" -> ((s, dir) => {
      val facts = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"))
      Enrich.enrich(facts, "n_name", "fetched") { k =>
        if (k.length % 2 == 0) Some(k.toLowerCase) else None
      }
        .select("n_nationkey", "n_name", "fetched")
        .orderBy("n_nationkey")
    }),

    // Count-Min Sketch heavy hitters: estimates are upper bounds from
    // a d×w counter grid whose hashes are deterministic md5 arithmetic
    // (CmsSketch.bucket) — bit-identical in DuckDB, so the whole
    // sketch path (counters → min-estimate → top-k) is oracle-exact
    // despite being approximate with respect to TRUE counts.
    "a11_cms_topk" -> ((s, dir) =>
      CmsSketch.topK(t(s, dir, "lineitem").select(col("l_suppkey")),
        "l_suppkey", 10)
        .select(col("l_suppkey").as("k"), col("est"))),

    // KMV cardinality sketch: distinct-count estimate from the k=64
    // smallest md5 hashes. Deterministic hash → the ESTIMATE itself
    // is oracle-exact (DuckDB replays the identical arithmetic),
    // unlike approx_count_distinct whose HLL is engine-private.
    "a12_kmv_distinct" -> ((s, dir) =>
      KmvSketch.distinctEstimate(t(s, dir, "lineitem"),
        "l_suppkey", 64)),

    // KMV set operations (KmvSketch.setOps): union and intersection
    // cardinality of two customer segments (1995 vs 1996 buyers)
    // from their k=64 sketches — the reason segment sketches are
    // stored at all: any pair's overlap from 2·64 longs, no corpus
    // rescan. Power-of-two k keeps the ratio estimator's float
    // arithmetic bit-exact across engines (see setOps doc), so the
    // ESTIMATES are oracle-exact, like a11/a12/a16.
    "a17_kmv_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a95 = o.filter(year(col("o_orderdate")) === 1995)
        .select("o_custkey")
      val b96 = o.filter(year(col("o_orderdate")) === 1996)
        .select("o_custkey")
      KmvSketch.setOps(a95, "o_custkey", b96, "o_custkey", 64)
    }),

    // HyperLogLog registers over order keys: max-rho per 2^8
    // registers — one narrow pass + a 256-row shuffle at ANY corpus
    // size, and the register CONTENTS are oracle-exact (shared md5
    // arithmetic + integer bit-length rho). The float estimator is
    // driver-side over ≤256 rows (Hll.estimate, spec'd).
    "a16_hll_registers" -> ((s, dir) =>
      Hll.registers(t(s, dir, "lineitem")
          .select(col("l_orderkey").cast("string").as("k")), "k")
        .orderBy("register")),

    // TPC-H Q3 shape: fact ⋈ two filtered dimensions. The customer
    // side shrinks to one segment (~20% of an already-small table) and
    // the orders filter prunes before either join — Catalyst's
    // size-based planning broadcasts both dimension sides, so the
    // 600k-row (→ billions at 100 TB) lineitem scan joins without a
    // shuffle; the only exchange is the final group-by.
    "q3_ship_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        // integer cents PER ROW, then an associative integer sum:
        // order-free, so the oracle (and any partial-agg schedule)
        // reproduces it exactly — a rounded double sum would hinge on
        // summation order at the cent boundary
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5)).as("revenue_e2"))
        .orderBy(col("revenue_e2").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: a five-way join tree where every side except
    // lineitem is dimension-sized. region→nation prunes to one
    // region's nations; customer/supplier must share the nation
    // (the classic cyclic join condition). All dimension joins
    // auto-broadcast on size; lineitem is scanned once, shuffled only
    // for the final per-nation aggregate.
    "q5_region_volume" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice",
          "l_discount")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(supp, li("l_suppkey") === supp("s_suppkey") &&
          cust("c_nationkey") === supp("s_nationkey"))
        .join(nat, supp("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        // see q3: per-row integer cents keep the sum order-free
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5)).as("revenue_e2"))
        .orderBy("n_name")
    }),

    // TPC-H Q6 shape (forecast revenue change): pure scan-side
    // filter + global agg — ALL three predicates must reach the
    // parquet scan as PushedFilters; revenue quantizes e4 per row
    // before the integer sum (ep·disc is one IEEE product, identical
    // both engines).
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1995-01-01" &&
          col("l_shipdate") < "1996-01-01" &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(floor(col("l_extendedprice") * col("l_discount") *
          10000 + 0.5).cast("long")).as("revenue_e4"),
          count(lit(1)).as("n_rows"))),

    // TPC-H Q10 shape (returned-item customer ranking): fact filter
    // → 3 dim joins → per-customer revenue → top 20. The big side is
    // lineitem(returnflag = 'R'); customer/nation broadcast, and the
    // final top-20 is a TakeOrdered, never a global sort. Revenue in
    // integer cents; ties broken by c_custkey in both engines.
    "q10_returned_items" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5).cast("long")
          .as("rev_e2"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1995-01-01" &&
          col("o_orderdate") < "1995-07-01")
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum("rev_e2").as("revenue_e2"))
        .orderBy(col("revenue_e2").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q4 shape (priority checking, adapted to this schema's
    // columns: the commit<receipt lateness predicate becomes
    // "EXISTS a lineitem shipped after the order date"): a date-
    // windowed orders scan SEMI-joined against lineitem — the
    // non-equi part (l_shipdate > o_orderdate) rides the equi-join
    // as a join-side filter, so no order ever matches twice and no
    // row explodes. One shuffle pair for the semi-join (orders side
    // prunes 1 year at the scan), then a tiny priority count.
    "q4_priority_exists" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1997-01-01")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li, ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q7 shape (volume shipping between two nations): the
    // 6-way tree where lineitem is the only fact — supplier,
    // orders→customer, and nation×2 all broadcast; the disjunctive
    // nation pair filter applies post-join (either direction), and
    // the final (supp_nation, cust_nation, year) aggregate is
    // 2·years rows. Revenue in per-row integer cents as in q3. The
    // 12↔10 pair is populated at every test SF incl. sf0.001 (the
    // smoke gate requires rows > 0).
    "q7_volume_shipping" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1998-01-01")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100 + 0.5).cast("long").as("rev_e2"))
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      val n1 = nat.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = nat.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_12" &&
            col("cust_nation") === "NATION_10") ||
          (col("supp_nation") === "NATION_10" &&
            col("cust_nation") === "NATION_12"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum("rev_e2").as("revenue_e2"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q14 shape (promo revenue share): one month of lineitem
    // joined to part (broadcast), revenue split by a CASE on p_type.
    // Both sums are per-row integer cents; the percentage is ONE
    // IEEE double divide quantized e6 — identical on both engines.
    "q14_promo_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1997-03-01" &&
          col("l_shipdate") < "1997-04-01")
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100 + 0.5).cast("long").as("rev_e2"))
      val part = t(s, dir, "part").select("p_partkey", "p_type")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_e2"))
            .otherwise(0L)).as("promo_rev_e2"),
          sum(col("rev_e2")).as("total_rev_e2"))
        .select(col("promo_rev_e2"), col("total_rev_e2"),
          floor(col("promo_rev_e2").cast("double") * 1000000
            / col("total_rev_e2") + 0.5).cast("long")
            .as("promo_pct_e6"))
    }),

    // TPC-H Q18 shape (large-volume orders): per-order quantity agg →
    // HAVING qty > 300 (the filter runs on the AGGREGATED frame, a
    // tiny fraction of orders) → join back to orders/customer
    // (broadcast the survivors' side? no — survivors join the big
    // orders table by key, and customer broadcasts) → top 20 by qty.
    // l_quantity is integral-valued; the sum casts to long exactly.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .filter(col("total_qty") > 300)
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("o_totalprice_e2"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      big.join(ord, big("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
          "o_totalprice_e2", "total_qty")
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q19 shape (bracketed disjunctive predicates): lineitem ⋈
    // part with an OR of three (brand, size-range, quantity-range)
    // conjunctions. The join key is the only equi condition; the
    // brackets evaluate post-join, and part broadcasts. Exercises
    // Catalyst's disjunction handling without relying on columns this
    // schema lacks (shipmode/container).
    "q19_bracket_predicates" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100 + 0.5).cast("long").as("rev_e2"))
      val part = t(s, dir, "part")
        .select("p_partkey", "p_brand", "p_size")
      val brackets =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(11, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .filter(brackets)
        .agg(sum("rev_e2").as("revenue_e2"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q15 shape (top supplier): per-supplier quarterly revenue,
    // then the suppliers achieving the MAXIMUM — the scalar-subquery
    // shape, spelled as a 1-row max aggregate broadcast back against
    // the (supplier-sized) revenue frame; ties all surface, ordered
    // by key. Revenue in per-row integer cents as in q3.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5).cast("long"))
          .as("total_rev_e2"))
      val mx = rev.agg(max("total_rev_e2").as("max_rev_e2"))
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_name")
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev_e2") === col("max_rev_e2"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_e2"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q22 shape (global-market candidates): customers with an
    // ABOVE-AVERAGE positive balance and no RECENT orders (none
    // since 2000 — plain "no orders" is empty in this synthetic
    // data, where every customer ordered at least once) — a scalar
    // average + NOT EXISTS anti-join. The average never materializes
    // as a double: the threshold test cross-multiplies in integer
    // cents (bal_e2 · cnt > sum_e2), so both engines compare exact
    // int64s and the oracle can never drift at the boundary.
    "q22_idle_balances" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_e2"))
      val avgStats = cust.agg(sum("bal_e2").as("sum_e2"),
        count(lit(1)).as("n_pos"))
      val rich = cust.crossJoin(broadcast(avgStats))
        .filter(col("bal_e2") * col("n_pos") > col("sum_e2"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "2000-01-01")
        .select(col("o_custkey"))
      rich.join(recent, rich("c_custkey") === recent("o_custkey"),
          "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum("bal_e2").as("total_bal_e2"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q2 shape (min-cost supplier per part): the per-GROUP
    // correlated scalar subquery — `cost = (SELECT min(cost) WHERE
    // same part)` — decorrelated the Spark way: one groupBy-min over
    // the part×supplier frame, joined back on (partkey, cost). No
    // partsupp table in this schema, so lineitem revenue per
    // (part, supplier) plays the supply-cost fact, restricted to one
    // region's suppliers and one part type like the real Q2. Scale
    // shape: part and supplier×nation are broadcast dims; the fact
    // agg and the min both shuffle on partkey, and the join-back is
    // a keyed join of two part-cardinality frames — never a
    // cartesian, nothing driver-side.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val smallParts = t(s, dir, "part")
        .filter(col("p_type") === "SMALL")
        .select("p_partkey", "p_name")
      val regSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
      val ps = t(s, dir, "lineitem")
        .join(broadcast(smallParts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(regSupp.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5).cast("long"))
          .as("cost_e2"))
      val mins = ps.groupBy(col("l_partkey"))
        .agg(min("cost_e2").as("min_cost_e2"))
        .withColumnRenamed("l_partkey", "m_partkey")
      ps.join(mins, col("l_partkey") === col("m_partkey") &&
          col("cost_e2") === col("min_cost_e2"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(regSupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("cost_e2"))
        .orderBy("p_partkey", "s_suppkey")
    }),

    // TPC-H Q20 shape (nested EXISTS chain): suppliers in a region
    // that shipped MORE THAN 60 units of some red part — an EXISTS
    // over a grouped-HAVING subquery that itself contains an IN
    // subquery. Spark spelling: innermost IN → broadcast inner join
    // on the filtered part dim; the grouped HAVING runs as a partial
    // aggregated frame; the outer EXISTS is a LEFT SEMI join, so
    // supplier rows never duplicate. l_quantity is integral-valued;
    // the sum casts to long exactly (same contract as q18).
    "q20_nested_exists" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").startsWith("red "))
        .select("p_partkey")
      val heavy = t(s, dir, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
        .filter(col("qty") > 60)
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q8 shape (national market share): one supplier-nation's
    // share of a region's market for a part type, per order year —
    // the conditional-share-of-aggregate pattern. Both the CASE'd
    // numerator and the total accumulate in integer cents; the share
    // divides ONCE in double and quantizes e6 (the q14 contract).
    // All dims broadcast; the fact scans once.
    "q8_market_share" -> ((s, dir) => {
      val custNation = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .select(col("c_custkey"))
      val suppNation = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .withColumnRenamed("n_name", "supp_nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val parts = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custNation), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .withColumn("rev_e2", floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5).cast("long"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("rev_e2"))
            .otherwise(0L)).as("nation_rev_e2"),
          sum(col("rev_e2")).as("total_rev_e2"))
        .withColumn("share_e6",
          floor(col("nation_rev_e2").cast("double") * 1000000
            / col("total_rev_e2") + 0.5).cast("long"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape (product-line profit by nation and year): this
    // schema has no partsupp supply cost, so profit = discounted
    // revenue MINUS the tax charge — each term floors to cents
    // independently before the subtraction, keeping the whole
    // aggregate in int64. Part-name LIKE filter + supplier-nation
    // rollup per year, dims broadcast.
    "q9_product_profit" -> ((s, dir) => {
      val bolts = t(s, dir, "part")
        .filter(col("p_name").contains("bolt")).select("p_partkey")
      val suppNation = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .withColumn("profit_e2",
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100 + 0.5).cast("long") -
          floor(col("l_extendedprice") * col("l_tax") * 100 + 0.5)
            .cast("long"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum("profit_e2").as("profit_e2"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // TPC-H Q12 shape (priority counts per shipping class): the
    // schema has no shipmode, so the class is the shipping DELAY
    // bucket (order→ship days: ≤30 fast, ≤60 medium, else slow) —
    // same CASE-count split of urgent vs other priorities per class.
    // One fact join keyed on the order, one aggregation.
    "q12_delay_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("delay_class",
          when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30,
            "1_fast")
            .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 60,
              "2_medium")
            .otherwise("3_slow"))
        .groupBy(col("delay_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("delay_class")
    }),

    // TPC-H Q11 shape (important stock): parts whose revenue exceeds
    // 1.3× the mean share — the global-scalar-subquery HAVING. The
    // fraction test cross-multiplies in integer cents (value·20000 >
    // total·13), so no double division exists to drift; the total is
    // a 1-row broadcast. Overflow headroom: value_e2·20000 stays in
    // int64 while any single part's revenue is < $4.6T.
    "q11_important_parts" -> ((s, dir) => {
      val pr = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") *
          (lit(1) - col("l_discount")) * 100 + 0.5).cast("long"))
          .as("value_e2"))
      val tot = pr.agg(sum("value_e2").as("total_e2"))
      pr.crossJoin(broadcast(tot))
        .filter(col("value_e2") * 20000 > col("total_e2") * 13)
        .select(col("l_partkey"), col("value_e2"))
        .orderBy(col("value_e2").desc, col("l_partkey"))
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join with the filter in the JOIN CONDITION (urgent orders don't
    // count, but order-less customers still appear at c_count = 0),
    // then a double aggregation — per-customer counts, then the
    // count-of-counts histogram. Two keyed shuffles, both sublinear
    // after the first agg.
    "q13_order_count_distribution" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q16 shape (supplier diversity per part group): distinct
    // suppliers per (brand, size) excluding a NOT IN subquery of
    // flagged suppliers — spelled as a LEFT ANTI join (the keys are
    // non-null, so NOT IN ≡ anti). Part dim and the (tiny) flagged
    // list broadcast; the count-distinct shuffles on (brand, size).
    "q16_supplier_part_types" -> ((s, dir) => {
      val okParts = t(s, dir, "part")
        .filter(col("p_type") =!= "ECONOMY")
        .select("p_partkey", "p_brand", "p_size")
      val flagged = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(okParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(30)
    }),

    // TPC-H Q17 shape (small-quantity revenue): the per-PART
    // correlated average — items below a fifth of their part's mean
    // quantity — decorrelated as a groupBy (sum, count) join-back
    // with an integer cross-multiplied test (5·qty·cnt < sum), so
    // the average never materializes as a double. l_quantity is
    // integral-valued (cast exact, the q18 contract).
    "q17_small_quantity_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val pa = li.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
          count(lit(1)).as("qty_cnt"))
      li.join(pa, "l_partkey")
        .filter(col("l_quantity").cast("long") * 5 * col("qty_cnt") <
          col("qty_sum"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("rev_e2"), count(lit(1)).as("n_items"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // double-correlated EXISTS + NOT EXISTS — a supplier's LATE item
    // (shipped > 85 days after the order date) on a multi-supplier
    // order where NO OTHER supplier was late. Both correlations are
    // keyed (order) joins: the EXISTS a LEFT SEMI against all items,
    // the NOT EXISTS a LEFT ANTI against the late set, each with the
    // supplier-inequality residual riding the equi key — never a
    // per-row subquery.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      // persisted: consumed as BOTH the probe side and (renamed) the
      // anti side below — unpersisted, the lineitem⋈orders join +
      // distinct ran twice per pass
      val late = Broadcasting.track(t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > date_add(col("o_orderdate"), 85))
        .select("l_orderkey", "l_suppkey").distinct()
        .persist())
      val others = li.withColumnRenamed("l_orderkey", "o2")
        .withColumnRenamed("l_suppkey", "s2")
      val lateOthers = late.withColumnRenamed("l_orderkey", "o3")
        .withColumnRenamed("l_suppkey", "s3")
      late
        .join(others, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    }),

    // Latest-wins upsert (Upsert.latestWins): base snapshot + a
    // changelog batch (modified totalprice for keys %10, inserted new
    // keys for %97), merged by the argmax-without-a-Window plan. The
    // oracle encodes the EXPECTED post-merge state directly (CASE +
    // UNION), independently of the merge machinery.
    "u1_upsert_latest" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val base = orders.withColumn("version", lit(1L))
      val upd = orders
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("version", lit(2L))
      val ins = orders
        .filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000000L)
        .withColumn("version", lit(2L))
      Upsert.latestWins(base, upd.unionByName(ins),
        Seq("o_orderkey"), "version")
        .groupBy(col("o_orderpriority"))
        // see q3: per-row integer cents keep the sum order-free
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("o_totalprice") * 100 + 0.5))
            .as("sum_price_e2"),
          sum("version").as("sum_version"))
        .orderBy("o_orderpriority")
    }),

    // Snapshot diff (Diff.summary): old = orders; new = the same
    // mutation as u1 (%10 keys repriced, %97 keys inserted at a
    // shifted id). The oracle encodes the expected classification
    // directly — changed/unchanged from the %10 test, added from the
    // %97 count — independent of the full-outer-join machinery.
    "u2_snapshot_diff" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val newer = orders
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(10)) === 0,
            col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")))
        .unionByName(orders
          .filter(pmod(col("o_orderkey"), lit(97)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000000L))
      Diff.summary(orders, newer, Seq("o_orderkey"))
        .orderBy("status")
    }),

    // SCD-2 history build (Scd2.intervals): three synthetic snapshot
    // versions of orders (%10 keys repriced at v2, %7 keys repriced
    // again at v3), collapsed into per-key validity intervals, then
    // summarized by (from, to) shape. The oracle derives the interval
    // census CLOSED-FORM from the key predicates — fully independent
    // of the window/segment machinery. to_version null (still
    // current) is coalesced to 0 for a hashable column.
    "u3_scd2_intervals" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val v2price = when(pmod(col("o_orderkey"), lit(10)) === 0,
        col("o_totalprice") + 1000.0).otherwise(col("o_totalprice"))
      val v1 = orders.withColumn("version", lit(1L))
      val v2base = orders.withColumn("o_totalprice", v2price)
      val v2 = v2base.withColumn("version", lit(2L))
      val v3 = v2base.withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .withColumn("version", lit(3L))
      Scd2.intervals(v1.unionByName(v2).unionByName(v3),
        Seq("o_orderkey"), "version")
        .groupBy(col("from_version"),
          coalesce(col("to_version"), lit(0L)).as("to_v"))
        .agg(count(lit(1)).as("n_intervals"))
        .orderBy("from_version", "to_v")
    }),

    // Incremental aggregate maintenance (IncrementalAgg.maintain):
    // the stored per-priority count/sum summary is refreshed from a
    // signed changelog ONLY — repriced keys (%10) as a -1/+1 pair in
    // place, moved keys (%13, not %10) as -1 in the old priority and
    // +1 in '1-URGENT', deleted keys (%89, not %10/%13) as -1,
    // inserted shifted keys (%97) as +1. The base corpus never
    // re-aggregates (spec-asserted on the physical plan). The oracle
    // aggregates the EXPECTED post-change corpus directly — fully
    // independent of the delta machinery. Integer cents keep the
    // signed replay exact.
    "u4_incremental_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("price_e2"))
      val is10 = pmod(col("o_orderkey"), lit(10)) === 0
      val is13 = pmod(col("o_orderkey"), lit(13)) === 0 && !is10
      val is89 = pmod(col("o_orderkey"), lit(89)) === 0 &&
        !is10 && !is13
      val summary = IncrementalAgg.aggregate(orders,
        Seq("o_orderpriority"), Seq("price_e2"))
      val repricedOld = orders.filter(is10)
      val repricedNew = repricedOld
        .withColumn("price_e2", col("price_e2") + 100000L)
      val movedOld = orders.filter(is13)
      val movedNew = movedOld
        .withColumn("o_orderpriority", lit("1-URGENT"))
      val deleted = orders.filter(is89)
      val inserted = orders
        .filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000000L)
      val delta = IncrementalAgg.signedDelta(
        deletes = repricedOld.unionByName(movedOld)
          .unionByName(deleted),
        inserts = repricedNew.unionByName(movedNew)
          .unionByName(inserted))
      IncrementalAgg.maintain(summary, delta,
        Seq("o_orderpriority"), Seq("price_e2"))
        .orderBy("o_orderpriority")
    }),

    // CDC-maintained aggregate (Diff.toChangelog ∘
    // IncrementalAgg.maintain): where u4 hand-builds the signed
    // changelog, u5 DERIVES it from two snapshots — the full
    // snapshot-diff → delta → summary-refresh loop a warehouse runs
    // nightly. Mutation: %10 keys repriced, %89-not-%10 keys
    // removed, %97 keys inserted at shifted ids. The oracle
    // aggregates the expected v2 corpus directly.
    "u5_cdc_maintain" -> ((s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("price_e2"))
      val is10 = pmod(col("o_orderkey"), lit(10)) === 0
      val is89 = pmod(col("o_orderkey"), lit(89)) === 0 && !is10
      val v2 = base.filter(!is89)
        .withColumn("price_e2",
          when(is10, col("price_e2") + 100000L)
            .otherwise(col("price_e2")))
        .unionByName(base
          .filter(pmod(col("o_orderkey"), lit(97)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000000L))
      val summary = IncrementalAgg.aggregate(base,
        Seq("o_orderstatus"), Seq("price_e2"))
      val delta = Diff.toChangelog(base, v2, Seq("o_orderkey"))
      IncrementalAgg.maintain(summary, delta,
        Seq("o_orderstatus"), Seq("price_e2"))
        .orderBy("o_orderstatus")
    }),

    // Join-view IVM (IvmJoin): maintain the materialized
    // orders⋈customer view under signed changelogs on BOTH sides —
    // inserts and deletes of orders AND customers — via the
    // delta-join rule ΔV = ΔA⋈B + A⋈ΔB + ΔA⋈ΔB (every term has a
    // delta-sized side; the base never re-joins the base). The
    // oracle joins the POST-delta states directly, so the hash
    // compare is exactly the algebra's correctness, including the
    // sign-product cancellation for deleted-order × inserted-customer
    // pairs. The maintained multiplicity m rides out (all 1 here —
    // key-preserving join), guarded loudly against negatives.
    "u6_ivm_join" -> ((s, dir) => {
      val ordersCk = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("ck"))
      val custCk = t(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_name"))
      val oldA = ordersCk.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
      val dA = IncrementalAgg.signedDelta(
        deletes = oldA.filter(pmod(col("o_orderkey"), lit(13)) === 0),
        inserts = ordersCk.filter(pmod(col("o_orderkey"), lit(10)) === 0))
      val oldB = custCk.filter(pmod(col("ck"), lit(7)) =!= 0)
      val dB = IncrementalAgg.signedDelta(
        deletes = oldB.filter(pmod(col("ck"), lit(11)) === 0),
        inserts = custCk.filter(pmod(col("ck"), lit(7)) === 0))
      val oldV = oldA.join(oldB, "ck")
      IvmJoin.applyDelta(oldV,
        IvmJoin.viewDelta(oldA, dA, oldB, dB, "ck"),
        Seq("o_orderkey", "ck", "c_name"))
        .select(col("o_orderkey"), col("ck").as("c_custkey"),
          col("c_name"), col("m"))
        .orderBy("o_orderkey")
    }),

    // One-pass exact table profile (Profiling.summary): per-column
    // null/distinct/min/max in long format — the ingest-time data-
    // quality summary. Exact distinct counts cost an Expand (documented
    // there; approxSummary is the HLL monitoring path).
    // Columnar-format interop: orders → ORC → back, then an integer-
    // cents aggregate over the re-read frame; the oracle aggregates
    // the PARQUET original, so the hash compare proves values (incl.
    // decimals) survive the ORC round-trip exactly. The write is a
    // DELIBERATE eager job inside the builder — the round-trip IS
    // the operator under test, one bounded job per run (contrast the
    // forbidden hidden-probe pattern Broadcasting.duringConstruction
    // guards against). ORC rides Spark's native reader: predicate
    // pushdown / column pruning apply to it the same as parquet.
    "s12_orc_roundtrip" -> ((s, dir) => {
      // deterministic path + overwrite, NOT createTempDirectory: the
      // bench re-runs builders per pass, and fresh dirs each pass
      // would accrue exactly the FS debt the harness works to avoid.
      // Keyed on (per-JVM token, full sanitized dir): stable within a
      // JVM so re-runs overwrite, but two JVMs benchmarking the same
      // dataset concurrently (bench + correctness runner) get
      // disjoint paths — otherwise one session's overwrite races the
      // other's scan (FileNotFoundException or silently wrong rows)
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_orc_" +
        orcScratchToken + "_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("sum_e2"))
        .orderBy("o_orderstatus")
    }),

    "s8_profile" -> ((s, dir) =>
      Profiling.summary(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_returnflag", "l_shipdate", "l_quantity"))
        .orderBy("column")),

    // Exact distributed quantiles (Quantiles.perGroup): rank-and-
    // interpolate through the spilling window sort, never the built-in
    // `percentile` aggregate's in-memory per-group buffer. Quarter
    // fractions over integer-valued quantities make the interpolation
    // arithmetic exact, not just reproducible.
    "a13_quantiles" -> ((s, dir) =>
      Quantiles.perGroup(t(s, dir, "lineitem"), "l_returnflag",
        "l_quantity", Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
        .orderBy("l_returnflag")),

    // Referential-integrity census: fact rows whose FK matches no
    // dimension row — the warehouse orphan check (Expectations'
    // cross-table face). Orphans are synthesized (%101 keys shifted
    // out of the orders key space) so the census is non-trivial;
    // plan = one unforced left-anti join (AQE owns broadcast-vs-
    // shuffle, the Ledger.pending contract). The oracle derives the
    // expected counts CLOSED-FORM from the key predicate — no anti
    // join at all.
    "p18_ref_integrity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"))
        .unionByName(t(s, dir, "lineitem")
          .filter(pmod(col("l_orderkey"), lit(101)) === 0)
          .select((col("l_orderkey") + 50000000000L).as("l_orderkey")))
      val ord = t(s, dir, "orders").select(col("o_orderkey"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"),
          countDistinct(col("l_orderkey")).as("n_orphan_keys"))
    }),

    // Interval OVERLAP join via bucket blocking — the 1-D spatial
    // join (order activity windows × promotion windows): both
    // interval sets explode to the 64-day buckets they span, the
    // equi-join on bucket replaces the inequality cross join, and
    // each qualifying pair is counted EXACTLY once by bucket
    // ownership (only the bucket containing the overlap's start
    // emits — no distinct needed). The oracle is the brute
    // range-condition join the engine never forms. Same
    // inverted-index shape as g7, one dimension down.
    "j15_interval_overlap" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_custkey") < 200)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("a_s"))
        .withColumn("a_e", col("a_s") + 7)
      val b = t(s, dir, "part").filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          (lit(9131L) + col("p_partkey") * 45).as("b_s"))
        .withColumn("b_e", col("b_s") + 30)
      val aB = a.withColumn("bk", explode(sequence(
        expr("a_s div 64"), expr("(a_e - 1) div 64"))))
      val bB = b.withColumn("bk", explode(sequence(
        expr("b_s div 64"), expr("(b_e - 1) div 64"))))
      aB.join(bB, Seq("bk"))
        .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .filter(col("bk") === expr("greatest(a_s, b_s) div 64"))
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("overlap_days"))
        .orderBy("p_partkey")
    }),

    // Declarative expectations (Expectations.check): six contract
    // rules over lineitem counted in ONE corpus pass (every rule
    // folds into the same aggregate — never N scans). Five hold on
    // the generated data; the deliberately-tight quantity ≤ 45 rule
    // genuinely breaches, so the report's fail path is exercised,
    // and a NULL predicate counts as a violation by design.
    "p17_expectations" -> ((s, dir) =>
      Expectations.check(t(s, dir, "lineitem"), Seq(
        Expectations.Rule("quantity_in_range",
          col("l_quantity").between(1, 50)),
        Expectations.Rule("quantity_tight",
          col("l_quantity") <= 45),
        Expectations.Rule("price_positive",
          col("l_extendedprice") > 0),
        Expectations.Rule("shipdate_present",
          col("l_shipdate").isNotNull),
        Expectations.Rule("discount_in_range",
          col("l_discount").between(0.0, 0.1)),
        Expectations.Rule("returnflag_domain",
          col("l_returnflag").isin("A", "N", "R"))))
        .orderBy("rule")),

    // Grouped top-k through the CUSTOM physical operator
    // (graft.plans.GroupedTopK — logical node + planner strategy +
    // two-phase heap exec): top-3 orders by price per priority. The
    // rank value is price·1e8 + key so ties cannot reach the k
    // boundary (the operator's determinism contract); the oracle is
    // the window row_number spelling the operator exists to beat —
    // same rows, no full per-group sort in the engine plan
    // (plan-asserted in GroupedTopKSpec).
    "w9_grouped_topk" -> ((s, dir) => {
      val b = t(s, dir, "orders").select(
        col("o_orderpriority"),
        (floor(col("o_totalprice") * 100 + 0.5).cast("long") *
          100000000L + col("o_orderkey")).as("rank_v"))
      GroupedTopK.topK(b, Seq("o_orderpriority"), "rank_v", 3)
        .orderBy("o_orderpriority", "rank_v")
    }),

    // IQR outlier census (robust data-quality gate): per event type,
    // rows beyond the Tukey fences q1 − 1.5·IQR / q3 + 1.5·IQR of
    // the e4-quantized value. Quartiles come from Quantiles.perGroup
    // (rank-interpolate, quantized to integers at scaleDigits = 0),
    // so fence arithmetic is exact on both engines; the event value
    // distribution is heavy-tailed enough that ~5% of rows genuinely
    // breach the fences. Plan: the quantile pass prunes to O(1) rows
    // per group pre-shuffle; the census is one corpus-side join
    // against a 5-row broadcast.
    "a18_iqr_outliers" -> ((s, dir) => {
      val b = t(s, dir, "events").select(col("event_type"),
        floor(col("value") * 10000 + 0.5).cast("long").as("v_e4"))
      val q = Quantiles.perGroup(b, "event_type", "v_e4",
        Seq(("q1", 0.25), ("q3", 0.75)), scaleDigits = 0)
      val iqr = col("q3_e0") - col("q1_e0")
      b.join(q, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(
            col("v_e4") < col("q1_e0") - lit(1.5) * iqr ||
              col("v_e4") > col("q3_e0") + lit(1.5) * iqr, 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // Fixed-width histogram: floor(price / width) binning — the
    // profiling staple; pure hash agg with map-side combine.
    "a14_histogram" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 5000).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bin"))
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT
        |  AS sum_base_e2,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |  ::BIGINT)::BIGINT AS sum_disc_e2,
        | floor(avg(l_quantity) * 10000 + 0.5) / 10000.0 AS avg_qty,
        | count(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a3_group_count" ->
      """SELECT l_suppkey, count(*) AS cnt FROM lineitem
        |GROUP BY 1 HAVING l_suppkey < 20 ORDER BY 1""".stripMargin,
    "a4_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        | count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a5_event_totals" ->
      """SELECT event_type, count(*) AS cnt,
        | sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT
        |  AS total_value_e2
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a6_batch_count" ->
      """WITH g AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem
        | GROUP BY 1)
        |SELECT n_lines, (n_lines + 2) // 3 AS n_batches,
        | count(*) AS n_orders
        |FROM g GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "a7_bounds" ->
      """SELECT l_linestatus, min(l_quantity) AS min_qty,
        | max(l_quantity) AS max_qty, min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a8_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "a1_argmax" ->
      """SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber FROM (
        | SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_returnflag
        |   ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "a9_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "a15_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
        | count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "w5_lag_lead" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | lag(l_quantity) OVER w AS prev_qty,
        | lead(l_quantity) OVER w AS next_qty
        |FROM lineitem WHERE l_suppkey < 5
        |WINDOW w AS (PARTITION BY l_suppkey
        | ORDER BY l_orderkey, l_linenumber)
        |ORDER BY 1, 2, 3""".stripMargin,
    "w8_rolling_spend" ->
      """WITH r AS (SELECT o_orderpriority,
        |  sum(floor(o_totalprice * 100 + 0.5)::BIGINT) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1970-01-01',
        |      o_orderdate::DATE)
        |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS roll
        | FROM orders)
        |SELECT o_orderpriority, count(*) AS cnt,
        | sum(roll)::BIGINT AS sum_roll_e2,
        | max(roll)::BIGINT AS max_roll_e2
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "w10_rolling_zscore" ->
      """WITH b AS (SELECT o_custkey, o_orderpriority,
        |  date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
        |    ::BIGINT AS day,
        |  floor(o_totalprice * 100 + 0.5)::BIGINT AS price_e2
        | FROM orders),
        |r AS (SELECT o_orderpriority, price_e2,
        |  count(*) OVER w AS n,
        |  sum(price_e2) OVER w AS s,
        |  sum(price_e2 * price_e2) OVER w AS ss
        | FROM b WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 2000 PRECEDING AND CURRENT ROW))
        |SELECT o_orderpriority,
        | count(*)::BIGINT AS n_windows,
        | sum(CASE WHEN
        |   (price_e2::HUGEINT * n - s) * (price_e2::HUGEINT * n - s)
        |     * (n - 1)
        |   > 4 * n::HUGEINT * (n * ss::HUGEINT - s::HUGEINT * s)
        |  THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM r WHERE n >= 6 GROUP BY 1 ORDER BY 1""".stripMargin,
    "p14_pivot" ->
      """SELECT l_returnflag,
        | count(*) FILTER (l_linestatus = 'F') AS "F",
        | count(*) FILTER (l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "s1_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey < 100 ORDER BY 1, 2""".stripMargin,
    "s3_filename_meta" ->
      "SELECT 'region' AS stem, count(*) AS cnt FROM region",
    "p3_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_custkey < 100 ORDER BY 1""".stripMargin,
    "p4_null_filter" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE props IS NOT NULL AND value > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p5_prefix_filter" ->
      """SELECT p_brand, count(*) AS cnt FROM part
        |WHERE p_name LIKE 's%' GROUP BY 1 ORDER BY 1""".stripMargin,
    "p6_set_membership" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') GROUP BY 1 ORDER BY 1""".stripMargin,
    "p9_split_guard" ->
      """SELECT CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_parts,
        | count(*) AS cnt
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "p11_start_from" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_name >= 'Customer#000000090' ORDER BY c_name""".stripMargin,
    "p13_regex_extract" ->
      """SELECT c_custkey,
        | CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num
        |FROM customer
        |WHERE CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) % 10 = 0
        |ORDER BY c_custkey""".stripMargin,
    "j1_broadcast_lookup" ->
      """SELECT r_name, count(*) AS n_cust FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j3_fact_join" ->
      """SELECT o_orderpriority, sum(l_quantity) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j4_enrich_coalesce" ->
      """SELECT coalesce(n_name, 'UNKNOWN') AS nation_name,
        | count(*) AS n_supp
        |FROM supplier LEFT JOIN
        | (SELECT * FROM nation WHERE n_nationkey < 10) n
        | ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // NOT EXISTS (not NOT IN): null-safe — matches Spark left_anti even if
    // the subquery side ever carries NULL keys.
    "j5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_totalprice > 300000 AND o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j6_semi_join" ->
      """SELECT count(*) AS n_parts_with_lines FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)""".stripMargin,
    "j7_missing_flag" ->
      """SELECT l_partkey IS NULL AS missing, count(*) AS cnt
        |FROM part LEFT JOIN
        | (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity > 45) l
        | ON p_partkey = l_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j8_range_join" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w6_ranking_windows" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
        |  AS pr_e6,
        | CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
        |  AS cd_e6
        |FROM lineitem WHERE l_orderkey < 60
        |WINDOW w AS (PARTITION BY l_returnflag
        | ORDER BY l_orderkey, l_linenumber)
        |ORDER BY 1, 2, 3""".stripMargin,
    "w1_batch_number" ->
      """SELECT l_orderkey, l_linenumber,
        | (row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber) - 1) // 3 + 1 AS batch
        |FROM lineitem WHERE l_orderkey < 50 ORDER BY 1, 2""".stripMargin,
    "w2_first_per_group" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS first_date FROM (
        | SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn = 1 AND o_custkey < 100
        |ORDER BY o_custkey""".stripMargin,
    "w3_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | sum(l_quantity) OVER (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem WHERE l_suppkey < 5 ORDER BY 1, 2, 3""".stripMargin,
    "w4_topk_per_group" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        | FROM orders WHERE o_custkey < 20)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "e1_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY 1""".stripMargin,
    "e2_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY 1""".stripMargin,
    "e3_intersect" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY 1""".stripMargin,
    "f18_array_ops" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words
        | FROM part WHERE p_partkey < 40)
        |SELECT p_partkey, len(words)::BIGINT AS n_words,
        | list_sort(words)[1] AS first_sorted,
        | array_to_string(words[1:2], '-') AS head2,
        | list_position(words, words[-1])::BIGINT AS last_pos
        |FROM w ORDER BY p_partkey""".stripMargin,
    "f19_null_funcs" ->
      """SELECT o_orderkey,
        | coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        | CASE WHEN o_totalprice > 200000 THEN 'big'
        |  WHEN o_totalprice > 100000 THEN 'mid'
        |  ELSE 'small' END AS bucket
        |FROM orders WHERE o_orderkey < 100 ORDER BY 1""".stripMargin,
    "e4_except_all" ->
      """WITH sup AS (SELECT s_suppkey AS k FROM supplier, range(100)),
        |d AS (SELECT l_suppkey AS k FROM lineitem
        |      EXCEPT ALL SELECT k FROM sup)
        |SELECT k, count(*) AS surviving FROM d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a20_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY cnt DESC, l_quantity DESC) AS rn FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty,
        | cnt::BIGINT AS mode_cnt
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin,
    // the independent n² spelling: literal dominance NOT EXISTS
    "a21_skyline" ->
      """SELECT q.o_orderkey,
        | strftime(q.o_orderdate, '%Y-%m-%d') AS o_date,
        | q.o_totalprice
        |FROM orders q
        |WHERE NOT EXISTS (
        | SELECT 1 FROM orders p
        | WHERE p.o_orderdate <= q.o_orderdate
        |  AND p.o_totalprice >= q.o_totalprice
        |  AND (p.o_orderdate < q.o_orderdate
        |       OR p.o_totalprice > q.o_totalprice))
        |ORDER BY 1""".stripMargin,
    "f8_sha2" ->
      """SELECT c_custkey, sha256(c_name) AS id_hash FROM customer
        |WHERE c_custkey < 20 ORDER BY 1""".stripMargin,
    "f10_date_format" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "f11_format_decimal" ->
      """SELECT l_orderkey, l_linenumber,
        | printf('%d.%02d', cents // 100, cents % 100) AS price_str
        |FROM (SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem WHERE l_orderkey < 30) ORDER BY 1, 2""".stripMargin,
    "f12_split_tail" ->
      """SELECT string_split(p_type, ' ')[-1] AS type_tail, count(*) AS cnt
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "f13_regex_replace" ->
      """SELECT c_custkey,
        | regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer WHERE c_custkey < 20 ORDER BY 1""".stripMargin,
    "f15_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
        |  AS k_mod, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "f16_coercions" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        | CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem WHERE l_orderkey < 30 ORDER BY 1, 2""".stripMargin,
    "s7_enrich" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CASE WHEN len(n_name) % 2 = 0 THEN lower(n_name) END AS fetched
        |FROM nation ORDER BY 1""".stripMargin,
    "a10_salted_agg" ->
      """SELECT l_returnflag, count(*) AS cnt,
        | sum(l_quantity) AS total
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "j12_salted_join" ->
      """SELECT s_nationkey, count(*) AS cnt,
        | sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Morton-code replay: 8-bit min/max buckets (integer div), bit
    // b of column c lands at result bit b*2+c (c: partkey=0,
    // suppkey=1).
    "p15_zorder_code" ->
      """WITH f AS (SELECT * FROM lineitem WHERE l_orderkey < 100),
        |mm AS (SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
        |       min(l_suppkey) AS mns, max(l_suppkey) AS mxs FROM f),
        |b AS (SELECT l_orderkey, l_linenumber::BIGINT AS line_no,
        |  ((l_partkey - mnp) * 256) // (mxp - mnp + 1) AS bp,
        |  ((l_suppkey - mns) * 256) // (mxs - mns + 1) AS bs
        | FROM f, mm)
        |SELECT l_orderkey, line_no,
        | list_sum(list_transform(range(0, 8), i ->
        |   (((bp >> i) & 1) << (2*i)) + (((bs >> i) & 1) << (2*i + 1))
        | ))::BIGINT AS z
        |FROM b ORDER BY l_orderkey, line_no""".stripMargin,
    "a11_cms_topk" ->
      """WITH d AS (SELECT unnest([0,1,2,3]) AS i),
        |h AS (SELECT ('0x' || substr(md5('cms:' ||
        |    l_suppkey::VARCHAR), 1, 15))::BIGINT AS h FROM lineitem),
        |probe AS (
        |  SELECT i, (h >> (i * 8)) & 255 AS bucket FROM h CROSS JOIN d),
        |cnt AS (SELECT i, bucket, count(*) AS c FROM probe GROUP BY 1, 2),
        |keys AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
        |kh AS (SELECT k, ('0x' || substr(md5('cms:' ||
        |    k::VARCHAR), 1, 15))::BIGINT AS h FROM keys),
        |kp AS (
        |  SELECT k, i, (h >> (i * 8)) & 255 AS bucket
        |  FROM kh CROSS JOIN d),
        |est AS (
        |  SELECT kp.k, min(c) AS est FROM kp
        |  JOIN cnt ON kp.i = cnt.i AND kp.bucket = cnt.bucket
        |  GROUP BY 1)
        |SELECT k, est FROM est ORDER BY est DESC, k LIMIT 10""".stripMargin,
    "a12_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' ||
        |      l_suppkey::VARCHAR), 1, 15))::BIGINT
        |    % 1152921504606846976 AS h
        |  FROM lineitem),
        |topk AS (SELECT h FROM h ORDER BY h LIMIT 64),
        |a AS (SELECT count(*) AS seen, max(h) AS kth FROM topk)
        |SELECT CASE WHEN seen < 64 THEN seen
        |  ELSE CAST(floor(63.0 * 1152921504606846976.0 /
        |    greatest(kth, 1) + 0.5) AS BIGINT) END AS est_distinct,
        | seen::BIGINT AS k_seen
        |FROM a""".stripMargin,
    // Replays the full sketch pipeline — per-segment top-64 hash
    // sets, merged union sketch, membership ratio — in SQL; the
    // estimator arithmetic matches setOps bit-for-bit (power-of-two
    // k, shared md5 hash).
    "a17_kmv_setops" ->
      """WITH a AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' ||
        |      o_custkey::VARCHAR), 1, 15))::BIGINT
        |    % 1152921504606846976 AS h
        |  FROM orders WHERE year(o_orderdate) = 1995),
        |ka AS (SELECT h FROM a ORDER BY h LIMIT 64),
        |b AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv:' ||
        |      o_custkey::VARCHAR), 1, 15))::BIGINT
        |    % 1152921504606846976 AS h
        |  FROM orders WHERE year(o_orderdate) = 1996),
        |kb AS (SELECT h FROM b ORDER BY h LIMIT 64),
        |u AS (SELECT DISTINCT h FROM
        |  (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |  ORDER BY h LIMIT 64),
        |st AS (SELECT count(*) AS seen, max(h) AS kth,
        |  count(*) FILTER (WHERE h IN (SELECT h FROM ka)
        |    AND h IN (SELECT h FROM kb)) AS n_both
        | FROM u),
        |e AS (SELECT seen, n_both,
        |  CASE WHEN seen < 64 THEN seen
        |    ELSE CAST(floor(63.0 * 1152921504606846976.0 /
        |      greatest(kth, 1) + 0.5) AS BIGINT) END AS est_union
        | FROM st)
        |SELECT est_union,
        | CAST(floor(n_both::DOUBLE * est_union /
        |   greatest(seen, 1) + 0.5) AS BIGINT) AS est_inter,
        | n_both::BIGINT AS k_both, seen::BIGINT AS union_seen
        |FROM e""".stripMargin,
    "a16_hll_registers" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5('hll:' ||
        |      l_orderkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |r AS (SELECT h % 256 AS register, h // 256 AS w FROM h),
        |x AS (SELECT register,
        |  CASE WHEN w = 0 THEN 53 ELSE 53 - length(format('{:b}', w))
        |  END AS rho FROM r)
        |SELECT register::BIGINT AS register, max(rho)::BIGINT AS max_rho
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    // Per-row integer cents (floor(x*100+0.5) replayed exactly), then
    // an integer sum — order-free on both engines, unlike a rounded
    // double sum whose cent-boundary behavior hinges on partial-agg
    // order.
    "q3_ship_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |   ::BIGINT)::BIGINT AS revenue_e2
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_e2 DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_volume" ->
      """SELECT n_name,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |   ::BIGINT)::BIGINT AS revenue_e2
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        | sum(floor(l_extendedprice * l_discount * 10000 + 0.5)
        |   ::BIGINT)::BIGINT AS revenue_e4,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |   ::BIGINT)::BIGINT AS revenue_e2
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
        |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q14_promo_revenue" ->
      """WITH j AS (
        |  SELECT p_type,
        |    floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      ::BIGINT AS rev_e2
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= '1997-03-01' AND l_shipdate < '1997-04-01'),
        |a AS (
        |  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev_e2
        |             ELSE 0 END)::BIGINT AS promo_rev_e2,
        |         sum(rev_e2)::BIGINT AS total_rev_e2 FROM j)
        |SELECT promo_rev_e2, total_rev_e2,
        | CAST(floor(promo_rev_e2::DOUBLE * 1000000 / total_rev_e2
        |   + 0.5) AS BIGINT) AS promo_pct_e6
        |FROM a""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity)::BIGINT AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        | floor(o_totalprice * 100 + 0.5)::BIGINT AS o_totalprice_e2,
        | total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q19_bracket_predicates" ->
      """SELECT
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |   ::BIGINT)::BIGINT AS revenue_e2,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 30
        |        AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |        AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      ::BIGINT)::BIGINT AS total_rev_e2
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_e2
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_e2 = (SELECT max(total_rev_e2) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_idle_balances" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    floor(c_acctbal * 100 + 0.5)::BIGINT AS bal_e2
        |  FROM customer WHERE c_acctbal > 0),
        |st AS (SELECT sum(bal_e2)::BIGINT AS sum_e2,
        |              count(*)::BIGINT AS n_pos FROM cust)
        |SELECT c_mktsegment, count(*)::BIGINT AS n_cust,
        |  sum(bal_e2)::BIGINT AS total_bal_e2
        |FROM cust CROSS JOIN st
        |WHERE bal_e2 * n_pos > sum_e2
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      ::BIGINT)::BIGINT AS cost_e2
        |  FROM lineitem
        |  WHERE l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
        |    AND l_suppkey IN
        |      (SELECT s_suppkey FROM supplier
        |       JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey
        |       WHERE r_name = 'EUROPE')
        |  GROUP BY 1, 2)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, cost_e2
        |FROM ps
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost_e2 = (SELECT min(ps2.cost_e2) FROM ps ps2
        |                 WHERE ps2.l_partkey = ps.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q20_nested_exists" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_suppkey = s_suppkey
        |      AND l_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
        |    GROUP BY l_partkey
        |    HAVING sum(l_quantity) > 60)
        |ORDER BY s_suppkey""".stripMargin,
    "q8_market_share" ->
      """SELECT
        | EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
        | sum(CASE WHEN sn.n_name = 'NATION_3'
        |   THEN floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |     ::BIGINT ELSE 0 END)::BIGINT AS nation_rev_e2,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |   ::BIGINT)::BIGINT AS total_rev_e2,
        | CAST(floor(
        |   sum(CASE WHEN sn.n_name = 'NATION_3'
        |     THEN floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |       ::BIGINT ELSE 0 END)::DOUBLE * 1000000
        |   / sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |       ::BIGINT) + 0.5) AS BIGINT) AS share_e6
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name,
        | EXTRACT(year FROM o_orderdate)::BIGINT AS o_year,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |     ::BIGINT
        |   - floor(l_extendedprice * l_tax * 100 + 0.5)::BIGINT)
        |  ::BIGINT AS profit_e2,
        | count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,
    "q12_delay_priority" ->
      """SELECT
        | CASE
        |   WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
        |     THEN '1_fast'
        |   WHEN date_diff('day', o_orderdate, l_shipdate) <= 60
        |     THEN '2_medium'
        |   ELSE '3_slow' END AS delay_class,
        | sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        | sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_important_parts" ->
      """WITH pr AS (
        |  SELECT l_partkey,
        |    sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      ::BIGINT)::BIGINT AS value_e2
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, value_e2 FROM pr
        |WHERE value_e2 * 20000 > 13 * (SELECT sum(value_e2)::BIGINT FROM pr)
        |ORDER BY value_e2 DESC, l_partkey""".stripMargin,
    "q13_order_count_distribution" ->
      """SELECT c_count, count(*)::BIGINT AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q16_supplier_part_types" ->
      """SELECT p_brand, p_size,
        | count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'ECONOMY'
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 30""".stripMargin,
    "q17_small_quantity_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey, sum(l_quantity::BIGINT)::BIGINT AS qty_sum,
        |    count(*)::BIGINT AS qty_cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT
        | sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT AS rev_e2,
        | count(*)::BIGINT AS n_items
        |FROM lineitem JOIN pa USING (l_partkey)
        |WHERE l_quantity::BIGINT * 5 * qty_cnt < qty_sum""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 85 DAY),
        |sole AS (
        |  SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
        |  WHERE EXISTS (SELECT 1 FROM lineitem l2
        |          WHERE l2.l_orderkey = l1.l_orderkey
        |            AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late l3
        |          WHERE l3.l_orderkey = l1.l_orderkey
        |            AND l3.l_suppkey <> l1.l_suppkey))
        |SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
        |FROM sole JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |   ::BIGINT)::BIGINT AS revenue_e2
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= '1995-01-01'
        |  AND o_orderdate < '1995-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_e2 DESC, c_custkey LIMIT 20""".stripMargin,
    // Encodes the EXPECTED post-merge state directly (CASE + UNION
    // ALL), independent of the merge machinery: %10 keys carry the
    // update (price+1000, version 2), %97 keys add a shifted-key
    // insert (original price, version 2), everything else passes
    // through at version 1.
    "u1_upsert_latest" ->
      """WITH merged AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 10 = 0
        |      THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS version
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice AS price, 2 AS version
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT o_orderpriority, count(*) AS cnt,
        | sum(floor(price * 100 + 0.5)::BIGINT)::BIGINT AS sum_price_e2,
        | sum(version)::BIGINT AS sum_version
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "u2_snapshot_diff" ->
      """SELECT status, count(*) AS cnt FROM (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'changed'
        |              ELSE 'unchanged' END AS status FROM orders
        |  UNION ALL
        |  SELECT 'added' FROM orders WHERE o_orderkey % 97 = 0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "u3_scd2_intervals" ->
      """WITH c AS (SELECT
        |  count(*) FILTER (WHERE o_orderkey % 10 <> 0
        |    AND o_orderkey % 7 <> 0) AS n00,
        |  count(*) FILTER (WHERE o_orderkey % 10 = 0
        |    AND o_orderkey % 7 <> 0) AS n10,
        |  count(*) FILTER (WHERE o_orderkey % 10 <> 0
        |    AND o_orderkey % 7 = 0) AS n01,
        |  count(*) FILTER (WHERE o_orderkey % 10 = 0
        |    AND o_orderkey % 7 = 0) AS n11
        | FROM orders)
        |SELECT * FROM (
        |  SELECT 1::BIGINT AS from_version, 0::BIGINT AS to_v,
        |    n00::BIGINT AS n_intervals FROM c
        |  UNION ALL SELECT 1, 1, n10 + n11 FROM c
        |  UNION ALL SELECT 1, 2, n01 FROM c
        |  UNION ALL SELECT 2, 0, n10 FROM c
        |  UNION ALL SELECT 2, 2, n11 FROM c
        |  UNION ALL SELECT 3, 0, n01 + n11 FROM c)
        |WHERE n_intervals > 0 ORDER BY from_version, to_v""".stripMargin,
    // Aggregates the EXPECTED post-change corpus directly: repriced
    // %10 keys (+1000.00), %13-not-%10 keys moved to '1-URGENT',
    // %89-not-%10/%13 keys removed, %97 keys duplicated at shifted
    // ids with original values — never touches the signed-changelog
    // machinery the engine maintains through.
    "u4_incremental_agg" ->
      """WITH v2 AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 10 <> 0
        |           THEN '1-URGENT' ELSE o_orderpriority END AS g,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT +
        |      CASE WHEN o_orderkey % 10 = 0 THEN 100000 ELSE 0 END AS p
        |  FROM orders
        |  WHERE NOT (o_orderkey % 89 = 0 AND o_orderkey % 10 <> 0
        |             AND o_orderkey % 13 <> 0)
        |  UNION ALL
        |  SELECT o_orderpriority, floor(o_totalprice * 100 + 0.5)::BIGINT
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT g AS o_orderpriority, count(*)::BIGINT AS cnt,
        |  sum(p)::BIGINT AS sum_price_e2
        |FROM v2 GROUP BY 1 ORDER BY 1""".stripMargin,
    // Aggregates the expected post-change corpus directly, never the
    // diff/changelog machinery the engine routes through.
    "u5_cdc_maintain" ->
      """WITH v2 AS (
        |  SELECT o_orderstatus,
        |    floor(o_totalprice * 100 + 0.5)::BIGINT +
        |      CASE WHEN o_orderkey % 10 = 0 THEN 100000 ELSE 0 END AS p
        |  FROM orders
        |  WHERE NOT (o_orderkey % 89 = 0 AND o_orderkey % 10 <> 0)
        |  UNION ALL
        |  SELECT o_orderstatus, floor(o_totalprice * 100 + 0.5)::BIGINT
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT o_orderstatus, count(*)::BIGINT AS cnt,
        |  sum(p)::BIGINT AS sum_price_e2
        |FROM v2 GROUP BY 1 ORDER BY 1""".stripMargin,

    // the independent spelling: join the POST-delta table states
    // directly (newA = base minus %13-deletes plus %10-inserts;
    // newB likewise with %11/%7)
    "u6_ivm_join" ->
      """WITH newA AS (
        |  SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderkey % 10 = 0 OR o_orderkey % 13 <> 0),
        |newB AS (
        |  SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey % 7 = 0 OR c_custkey % 11 <> 0)
        |SELECT a.o_orderkey, b.c_custkey, b.c_name, 1::BIGINT AS m
        |FROM newA a JOIN newB b ON a.o_custkey = b.c_custkey
        |ORDER BY 1""".stripMargin,
    // the oracle reads the PARQUET original — equality proves the
    // ORC round-trip is value-exact
    "s12_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS cnt,
        | sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT
        |  AS sum_e2
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "s8_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |    count(*) - count(l_orderkey) AS n_nulls,
        |    count(DISTINCT l_orderkey) AS n_distinct,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_val,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*),
        |    count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag),
        |    CAST(min(l_returnflag) AS VARCHAR),
        |    CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*),
        |    count(*) - count(l_shipdate),
        |    count(DISTINCT l_shipdate),
        |    CAST(min(l_shipdate) AS VARCHAR),
        |    CAST(max(l_shipdate) AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*),
        |    count(*) - count(l_quantity),
        |    count(DISTINCT l_quantity),
        |    CAST(min(l_quantity) AS VARCHAR),
        |    CAST(max(l_quantity) AS VARCHAR) FROM lineitem
        |) ORDER BY "column"""".stripMargin,
    // Replays Quantiles.perGroup's rank-and-interpolate formula
    // exactly: lo = floor((n-1)p)+1, v = vLo + frac*(vHi - vLo),
    // frac = (n-1)p - floor((n-1)p), half-up scaled to 10^2.
    "a13_quantiles" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_quantity AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |a AS (
        |  SELECT g, max(n) AS n1,
        |    max(CASE WHEN rn = floor((n-1)*0.25) + 1 THEN v END) AS lo25,
        |    max(CASE WHEN rn = floor((n-1)*0.25) + 2 THEN v END) AS hi25,
        |    max(CASE WHEN rn = floor((n-1)*0.5) + 1 THEN v END) AS lo50,
        |    max(CASE WHEN rn = floor((n-1)*0.5) + 2 THEN v END) AS hi50,
        |    max(CASE WHEN rn = floor((n-1)*0.75) + 1 THEN v END) AS lo75,
        |    max(CASE WHEN rn = floor((n-1)*0.75) + 2 THEN v END) AS hi75
        |  FROM r GROUP BY g)
        |SELECT g AS l_returnflag,
        |  CAST(floor((CASE WHEN hi25 IS NULL THEN lo25
        |    ELSE lo25 + ((n1-1)*0.25 - floor((n1-1)*0.25)) * (hi25 - lo25)
        |    END) * 100.0 + 0.5) AS BIGINT) AS p25_e2,
        |  CAST(floor((CASE WHEN hi50 IS NULL THEN lo50
        |    ELSE lo50 + ((n1-1)*0.5 - floor((n1-1)*0.5)) * (hi50 - lo50)
        |    END) * 100.0 + 0.5) AS BIGINT) AS p50_e2,
        |  CAST(floor((CASE WHEN hi75 IS NULL THEN lo75
        |    ELSE lo75 + ((n1-1)*0.75 - floor((n1-1)*0.75)) * (hi75 - lo75)
        |    END) * 100.0 + 0.5) AS BIGINT) AS p75_e2
        |FROM a ORDER BY l_returnflag""".stripMargin,
    // closed-form from the key predicate: only the shifted %101
    // copies are orphaned, every original lineitem has its order
    "p18_ref_integrity" ->
      """SELECT count(*) AS n_orphans,
        | count(DISTINCT l_orderkey) AS n_orphan_keys
        |FROM lineitem WHERE l_orderkey % 101 = 0""".stripMargin,
    // brute range-condition join — no buckets, no ownership trick
    "j15_interval_overlap" ->
      """WITH a AS (SELECT o_orderkey,
        |  date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
        |    AS a_s,
        |  date_diff('day', DATE '1970-01-01', o_orderdate::DATE) + 7
        |    AS a_e
        | FROM orders WHERE o_custkey < 200),
        |b AS (SELECT p_partkey, 9131 + p_partkey * 45 AS b_s,
        |  9131 + p_partkey * 45 + 30 AS b_e
        | FROM part WHERE p_partkey < 50)
        |SELECT p_partkey, count(*) AS n_overlaps,
        | sum(least(a_e, b_e) - greatest(a_s, b_s))::BIGINT
        |  AS overlap_days
        |FROM b JOIN a ON a_s < b_e AND b_s < a_e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p17_expectations" ->
      """WITH c AS (SELECT count(*) AS n,
        |  count(*) FILTER (WHERE NOT coalesce(
        |    l_quantity BETWEEN 1 AND 50, false)) AS v1,
        |  count(*) FILTER (WHERE NOT coalesce(
        |    l_quantity <= 45, false)) AS v2,
        |  count(*) FILTER (WHERE NOT coalesce(
        |    l_extendedprice > 0, false)) AS v3,
        |  count(*) FILTER (WHERE l_shipdate IS NULL) AS v4,
        |  count(*) FILTER (WHERE NOT coalesce(
        |    l_discount BETWEEN 0.0 AND 0.1, false)) AS v5,
        |  count(*) FILTER (WHERE NOT coalesce(
        |    l_returnflag IN ('A', 'N', 'R'), false)) AS v6
        | FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'quantity_in_range' AS rule, n AS n_rows,
        |    v1::BIGINT AS n_violations, v1 = 0 AS pass FROM c
        |  UNION ALL SELECT 'quantity_tight', n, v2, v2 = 0 FROM c
        |  UNION ALL SELECT 'price_positive', n, v3, v3 = 0 FROM c
        |  UNION ALL SELECT 'shipdate_present', n, v4, v4 = 0 FROM c
        |  UNION ALL SELECT 'discount_in_range', n, v5, v5 = 0 FROM c
        |  UNION ALL SELECT 'returnflag_domain', n, v6, v6 = 0 FROM c)
        |ORDER BY rule""".stripMargin,
    "w9_grouped_topk" ->
      """WITH b AS (SELECT o_orderpriority,
        |  floor(o_totalprice * 100 + 0.5)::BIGINT * 100000000
        |    + o_orderkey AS rank_v
        | FROM orders),
        |r AS (SELECT o_orderpriority, rank_v,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY rank_v DESC) AS rn FROM b)
        |SELECT o_orderpriority, rank_v FROM r WHERE rn <= 3
        |ORDER BY 1, 2""".stripMargin,
    // a13's rank-interpolate machinery for the quartiles (quantized
    // *1.0 to integers, matching perGroup scaleDigits = 0), then the
    // Tukey-fence census over the same base rows
    "a18_iqr_outliers" ->
      """WITH b AS (SELECT event_type AS g,
        |  floor(value * 10000 + 0.5)::BIGINT AS v FROM events),
        |r AS (SELECT g, v,
        |  row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n FROM b),
        |a AS (SELECT g, max(n) AS n1,
        |  max(CASE WHEN rn = floor((n-1)*0.25) + 1 THEN v END) AS lo1,
        |  max(CASE WHEN rn = floor((n-1)*0.25) + 2 THEN v END) AS hi1,
        |  max(CASE WHEN rn = floor((n-1)*0.75) + 1 THEN v END) AS lo3,
        |  max(CASE WHEN rn = floor((n-1)*0.75) + 2 THEN v END) AS hi3
        | FROM r GROUP BY g),
        |qq AS (SELECT g,
        |  CAST(floor((CASE WHEN hi1 IS NULL THEN lo1
        |    ELSE lo1 + ((n1-1)*0.25 - floor((n1-1)*0.25)) * (hi1 - lo1)
        |    END) * 1.0 + 0.5) AS BIGINT) AS q1,
        |  CAST(floor((CASE WHEN hi3 IS NULL THEN lo3
        |    ELSE lo3 + ((n1-1)*0.75 - floor((n1-1)*0.75)) * (hi3 - lo3)
        |    END) * 1.0 + 0.5) AS BIGINT) AS q3
        | FROM a)
        |SELECT b.g AS event_type, count(*) AS cnt,
        | count(*) FILTER (WHERE v < q1 - 1.5 * (q3 - q1)
        |   OR v > q3 + 1.5 * (q3 - q1))::BIGINT AS n_outliers
        |FROM b JOIN qq ON b.g = qq.g
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a14_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
        | count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
