package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rewrite: users write the idiomatic
  * row_number-window-filter spelling and the plan gets the heap
  * operator automatically. Reference results come from the SAME
  * query shape evaluated without a Filter node (the rule only fires
  * on Filter-over-Window), filtered driver-side. */
class TopKRewriteSpec extends SparkTestBase
  with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  GraftFunctions.register(spark)
  // opt-in (see TopKRewrite doc: win region is group-cardinality-
  // dependent, so the rule is off by default); the session is shared
  // across suites, so restore the default afterwards
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "true")
  }
  override def afterAll(): Unit = {
    spark.conf.unset(graft.plans.TopKRewrite.EnabledKey)
    super.afterAll()
  }

  // unique order values (v·1000 + id) so ranks are deterministic
  private def frame: DataFrame = spark.range(0, 3000).select(
    (col("id") % 13).as("g"),
    (((col("id") * 131) % 500) * 1000 + col("id")).as("v"))
    .repartition(5)

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def ref(k: Int): Set[(Long, Long, Long)] =
    frame.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .filter(_._3 <= k).toSet

  test("DataFrame window filter is rewritten to the heap operator") {
    val df = frame.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") <= 3)
    val p = physical(df)
    assert(p.contains("GroupedTopK"), p)
    // Spark's own sort-based WindowGroupLimit must be STRIPPED, not
    // left sorting underneath the heap
    assert(!p.contains("WindowGroupLimit"), p)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == ref(3))
  }

  test("the cast('long') rank spelling rewrites too (pushed-down Cast)") {
    val df = frame.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc))
        .cast("long"))
      .filter(col("rnk") <= 4)
    assert(physical(df).contains("GroupedTopK"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref(4))
  }

  test("SQL spelling rewrites: rn <= k inside a subquery") {
    frame.createOrReplaceTempView("topk_rewrite_t")
    val df = spark.sql(
      """SELECT g, v, rn FROM (
        |  SELECT g, v, row_number() OVER
        |    (PARTITION BY g ORDER BY v DESC) AS rn
        |  FROM topk_rewrite_t) WHERE rn <= 2""".stripMargin)
    assert(physical(df).contains("GroupedTopK"), physical(df))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == ref(2))
  }

  test("ascending keeps the smallest k; rn = 1 becomes a 1-heap") {
    // `id % 13` is nullable BY TYPE (mod-by-zero semantics), so bare
    // .asc defaults to NULLS FIRST and the rule correctly declines;
    // the heap-safe ascending spelling is explicit NULLS LAST
    val asc = frame.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc_nulls_last)))
      .filter(col("rn") < 3) // strict: k = 2
    assert(physical(asc).contains("GroupedTopK"))
    val gotAsc = asc.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refAsc = frame.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap(_.sortBy(_._2).take(2)).toSet
    assert(gotAsc == refAsc)
    val first = frame.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") === 1)
    assert(physical(first).contains("GroupedTopK"))
    assert(first.count() == 13)
  }

  test("guards: nulls-first order and non-row_number windows don't rewrite") {
    val nullable = spark.range(0, 200).select(
      (col("id") % 5).as("g"),
      when(col("id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("id")).as("v"))
    // ascending on a nullable column defaults to NULLS FIRST — the
    // heap's nulls-last contract would drop the rows the window
    // ranks on top, so the rule must decline
    val nf = nullable.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc)))
      .filter(col("rn") <= 2)
    assert(!physical(nf).contains("GroupedTopK"), physical(nf))
    // …but an explicit NULLS LAST is heap-safe
    val nl = nullable.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc_nulls_last)))
      .filter(col("rn") <= 2)
    assert(physical(nl).contains("GroupedTopK"), physical(nl))
    // rank() is not row_number: pruning would be wrong, must decline
    val rk = frame.withColumn("rn", rank().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") <= 3)
    assert(!physical(rk).contains("GroupedTopK"), physical(rk))
    // global top-k (no partition keys) stays with the window/sort
    val global = frame.withColumn("rn", row_number().over(
        Window.orderBy(col("v").desc)))
      .filter(col("rn") <= 3)
    assert(!physical(global).contains("GroupedTopK"), physical(global))
  }

  test("random frames: rewrite-on equals rewrite-off row for row") {
    import org.scalacheck.Gen
    var seed = org.scalacheck.rng.Seed(4242L)
    val gen = for {
      n <- Gen.choose(1, 400)
      gMod <- Gen.choose(1, 20)
      k <- Gen.choose(1, 5)
      desc <- Gen.oneOf(true, false)
      parts <- Gen.choose(1, 7)
    } yield (n, gMod, k, desc, parts)
    (0 until 6).foreach { _ =>
      val (n, gMod, k, desc, parts) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // unique order values → deterministic ranks on both plans
      val base = spark.range(0, n).select(
        (col("id") % gMod).as("g"),
        (((col("id") * 131) % 97) * 1000 + col("id")).as("v"))
        .repartition(parts)
      def run(): Set[(Long, Long, Long)] = {
        val ord = if (desc) col("v").desc else col("v").asc_nulls_last
        base.withColumn("rn", row_number().over(
            Window.partitionBy(col("g")).orderBy(ord)))
          .filter(col("rn") <= k)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
          .toSet
      }
      spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "false")
      val off = try run()
        finally spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "true")
      val on = run()
      assert(on == off, s"n=$n gMod=$gMod k=$k desc=$desc parts=$parts")
    }
  }

  test("rewrite composes with pushdown: group filter lands below the heap") {
    // rn <= k gets the heap; the g-filter should then travel
    // Catalyst's Window pushdown + GroupedTopKPushdown all the way
    // under the operator, so discarded groups never heap at all
    val df = frame.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") <= 3 && col("g") === 5)
    val opt = df.queryExecution.optimizedPlan.toString
    val topkIdx = opt.indexOf("GroupedTopK")
    assert(topkIdx >= 0, opt)
    // the g-filter ends up below the heap, alias-inlined all the way
    // to the source (Filter ((id % 13) = 5) above the Range)
    assert(opt.substring(topkIdx).contains("Filter ("),
      s"group filter not below the heap:\n$opt")
    assert(!opt.substring(0, topkIdx).contains("= 5"),
      s"group filter still above the heap:\n$opt")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == ref(3).filter(_._1 == 5L))
  }

  test("off by default: without the opt-in conf the window plan stands") {
    spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "false")
    try {
      val df = frame.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc)))
        .filter(col("rn") <= 3)
      assert(!physical(df).contains("GroupedTopK"))
    } finally spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "true")
  }

  test("narrowing cast on the rank declines (wrapped ranks would be mis-pruned)") {
    // rn.cast("byte") <= 4 with >255 rows in a group: ranks 257, 513…
    // wrap into [-128,127] and satisfy the ORIGINAL filter — pruning
    // to 4 rows per group would drop them, changing results. Only
    // widening casts are strippable. (Two real groups of 300 rows —
    // a constant key would fold out of the partition spec entirely.)
    val one = spark.range(0, 600).select(
      (col("id") % 2).as("g"), col("id").as("v"))
    def byteCast = one.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc))
        .cast("byte"))
      .filter(col("rnk") <= 4)
    assert(!physical(byteCast).contains("GroupedTopK"), physical(byteCast))
    // the widening long cast (the common `.cast("long")` alias) must
    // keep rewriting — regression guard against over-tightening
    val longCast = one.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc))
        .cast("long"))
      .filter(col("rnk") <= 4)
    assert(physical(longCast).contains("GroupedTopK"), physical(longCast))
    // Semantics on the declined plan. Under ANSI (Spark 4 default)
    // rank 128 OVERFLOWS the byte cast at runtime — pruning to 4 rows
    // per group would have swallowed that error. Under legacy mode
    // the ranks WRAP and wrapped values (257→1, 128→-128…) satisfy
    // the filter — pruning would have dropped them.
    val overflow = intercept[Exception](byteCast.count())
    assert(overflow.toString.contains("CAST_OVERFLOW") ||
      String.valueOf(overflow.getCause).contains("CAST_OVERFLOW"),
      overflow.toString)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try assert(byteCast.count() > 4)
    finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("ndv stats gate: low-ndv keys plan the heap, high-ndv keep the window") {
    // With CBO column stats the group cardinality IS visible at plan
    // time, so the rewrite self-gates on rewriteMaxGroups instead of
    // trusting the conf blindly (round-12; crossover measured in the
    // r11 A/B). Both tables are analyzed; only the threshold differs
    // between them.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set(graft.plans.TopKRewrite.RewriteMaxGroupsKey, "100")
    try {
      spark.range(0, 2000)
        .select((col("id") % 7).as("g"), col("id").as("v"))
        .write.mode("overwrite").saveAsTable("topk_ndv_low")
      spark.sql(
        "ANALYZE TABLE topk_ndv_low COMPUTE STATISTICS FOR COLUMNS g, v")
      spark.range(0, 2000)
        .select(col("id").as("g"), col("id").as("v"))
        .write.mode("overwrite").saveAsTable("topk_ndv_high")
      spark.sql(
        "ANALYZE TABLE topk_ndv_high COMPUTE STATISTICS FOR COLUMNS g, v")
      def shape(table: String): DataFrame =
        spark.table(table).withColumn("rn", row_number().over(
            Window.partitionBy(col("g")).orderBy(col("v").desc)))
          .filter(col("rn") <= 3)
      val low = shape("topk_ndv_low")
      assert(physical(low).contains("GroupedTopK"),
        s"ndv=7 ≤ 100 should heap:\n${physical(low)}")
      val high = shape("topk_ndv_high")
      assert(!physical(high).contains("GroupedTopK"),
        s"ndv≈2000 > 100 should keep the window:\n${physical(high)}")
      // and the gated plan is still correct
      assert(low.count() == 7 * 3)
      // stats ABSENT (in-memory frame): conf is trusted, heap plans,
      // even under the tight threshold — the pre-stats behavior
      val nostats = frame.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc)))
        .filter(col("rn") <= 3)
      assert(physical(nostats).contains("GroupedTopK"))
    } finally {
      spark.conf.unset(graft.plans.TopKRewrite.RewriteMaxGroupsKey)
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS topk_ndv_low")
      spark.sql("DROP TABLE IF EXISTS topk_ndv_high")
    }
  }

  test("auto mode rewrites only what stats prove cheap") {
    // enabled=auto is the leave-on-for-the-session setting: a frame
    // WITHOUT column stats keeps the window (it can never pessimize
    // an un-analyzed query); an analyzed low-ndv table still gets
    // the heap
    spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "auto")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val nostats = frame.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc)))
        .filter(col("rn") <= 3)
      assert(!physical(nostats).contains("GroupedTopK"), physical(nostats))
      spark.range(0, 2000)
        .select((col("id") % 7).as("g"), col("id").as("v"))
        .write.mode("overwrite").saveAsTable("topk_auto_low")
      spark.sql(
        "ANALYZE TABLE topk_auto_low COMPUTE STATISTICS FOR COLUMNS g, v")
      val proven = spark.table("topk_auto_low")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc)))
        .filter(col("rn") <= 3)
      assert(physical(proven).contains("GroupedTopK"),
        s"auto should heap the ndv=7 analyzed table:\n${physical(proven)}")
      assert(proven.count() == 7 * 3)
    } finally {
      spark.conf.set(graft.plans.TopKRewrite.EnabledKey, "true")
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS topk_auto_low")
    }
  }

  test("float-bearing struct partition keys decline: the window " +
    "stays and keeps recursive float normalization") {
    // vanilla Window normalizes floats RECURSIVELY inside struct
    // keys (-0.0 ≡ 0.0); the heap only normalizes top-level keys,
    // so the rewrite must leave this shape alone rather than split
    // one SQL group into two
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L))
      .toDF("x", "v")
      .select(struct(col("x")).as("g"), col("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") <= 1)
    val p = physical(df)
    assert(!p.contains("GroupedTopK"), p)
    val got = df.select("v").collect().map(_.getLong(0)).toSet
    // -0.0 and 0.0 are ONE group under SQL equality: top-1 keeps v=2
    assert(got == Set(2L, 3L), s"$got")
  }

  test("k above rewriteMaxK declines; conjunction with other predicates rewrites") {
    spark.conf.set(graft.plans.TopKRewrite.RewriteMaxKKey, "3")
    try {
      val big = frame.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc)))
        .filter(col("rn") <= 4)
      assert(!physical(big).contains("GroupedTopK"))
    } finally spark.conf.unset(graft.plans.TopKRewrite.RewriteMaxKKey)
    val conj = frame.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc)))
      .filter(col("rn") <= 3 && col("g") =!= 7)
    assert(physical(conj).contains("GroupedTopK"))
    val got = conj.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == ref(3).filter(_._1 != 7L))
  }
}
