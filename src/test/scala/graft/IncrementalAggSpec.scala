package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def orders: DataFrame =
    Tables.load(spark, sf, "orders").select(
      col("o_orderkey"), col("o_orderpriority"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long")
        .as("price_e2"))

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("maintain equals re-aggregating the post-change corpus") {
    val base = orders
    val is10 = pmod(col("o_orderkey"), lit(10)) === 0
    val is13 = pmod(col("o_orderkey"), lit(13)) === 0 && !is10
    val repricedOld = base.filter(is10)
    val repricedNew = repricedOld
      .withColumn("price_e2", col("price_e2") + 100000L)
    val movedOld = base.filter(is13)
    val movedNew = movedOld
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val summary = IncrementalAgg.aggregate(base,
      Seq("o_orderpriority"), Seq("price_e2"))
    val delta = IncrementalAgg.signedDelta(
      deletes = repricedOld.unionByName(movedOld),
      inserts = repricedNew.unionByName(movedNew))
    val maintained = IncrementalAgg.maintain(summary, delta,
      Seq("o_orderpriority"), Seq("price_e2"))
    val v2 = base.filter(!is10 && !is13)
      .unionByName(repricedNew).unionByName(movedNew)
    val expected = IncrementalAgg.aggregate(v2,
      Seq("o_orderpriority"), Seq("price_e2"))
    assert(asSet(maintained) == asSet(expected))
  }

  test("a group whose count reaches zero vanishes") {
    val base = orders
    val gone = base.filter(col("o_orderpriority") === "1-URGENT")
    assert(gone.limit(1).count() == 1, "fixture needs a 1-URGENT row")
    val summary = IncrementalAgg.aggregate(base,
      Seq("o_orderpriority"), Seq("price_e2"))
    val delta = IncrementalAgg.signedDelta(
      deletes = gone, inserts = gone.limit(0))
    val maintained = IncrementalAgg.maintain(summary, delta,
      Seq("o_orderpriority"), Seq("price_e2"))
    assert(maintained
      .filter(col("o_orderpriority") === "1-URGENT").count() == 0)
    // every other group untouched
    val expected = IncrementalAgg.aggregate(
      base.filter(col("o_orderpriority") =!= "1-URGENT"),
      Seq("o_orderpriority"), Seq("price_e2"))
    assert(asSet(maintained) == asSet(expected))
  }

  test("over-deleting fails loudly, never a silent negative count") {
    val base = orders
    val doomed = base.filter(col("o_orderpriority") === "1-URGENT")
    val summary = IncrementalAgg.aggregate(base,
      Seq("o_orderpriority"), Seq("price_e2"))
    val delta = IncrementalAgg.signedDelta(
      deletes = doomed.unionByName(doomed), // deleted twice
      inserts = doomed.limit(0))
    val ex = intercept[Exception] {
      IncrementalAgg.maintain(summary, delta,
        Seq("o_orderpriority"), Seq("price_e2")).collect()
    }
    assert(ex.getMessage.contains("negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative")),
      s"unexpected failure: $ex")
  }

  test("the maintained plan scans summary + delta, never the corpus") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ivm").toString
    val base = orders
    IncrementalAgg.aggregate(base, Seq("o_orderpriority"),
      Seq("price_e2")).write.parquet(s"$tmp/summary")
    val stored = spark.read.parquet(s"$tmp/summary")
    val touched = base.filter(pmod(col("o_orderkey"), lit(10)) === 0)
    val delta = IncrementalAgg.signedDelta(
      deletes = touched,
      inserts = touched.withColumn("price_e2",
        col("price_e2") + 100000L))
    delta.write.parquet(s"$tmp/delta")
    val maintained = IncrementalAgg.maintain(
      stored, spark.read.parquet(s"$tmp/delta"),
      Seq("o_orderpriority"), Seq("price_e2"))
    // read the OPTIMIZED LOGICAL plan: AQE wraps the physical tree in
    // a leaf AdaptiveSparkPlanExec, hiding scans from collect()
    val scanned = maintained.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.nonEmpty)
    assert(scanned.forall(p =>
      p.contains("graft_ivm")), s"unexpected scan roots: $scanned")
    assert(!scanned.exists(_.contains("testdata")),
      s"maintained plan re-read the corpus: $scanned")
    assert(maintained.count() > 0)
  }

  test("rescanGroups recomputes only touched groups (min/max exact)") {
    val base = orders
    def mm(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(min("price_e2").as("min_p"), max("price_e2").as("max_p"))
    val summaryV1 = mm(base)
    // delete every 1-URGENT row above the group median-ish threshold:
    // min/max must come from a real rescan, not delta arithmetic
    val newCorpus = base.filter(
      col("o_orderpriority") =!= "1-URGENT" ||
        pmod(col("o_orderkey"), lit(2)) === 0)
    val touched = base.filter(col("o_orderpriority") === "1-URGENT")
    val out = IncrementalAgg.rescanGroups(summaryV1, newCorpus,
      touched, Seq("o_orderpriority"), mm)
    assert(asSet(out) == asSet(mm(newCorpus)))
  }
}
