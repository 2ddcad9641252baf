package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  test("assignBuckets bins a uniform range near-evenly, map-side") {
    val df = spark.range(0, 1000).select(col("id"),
      col("id").cast("double").as("score"))
    val bucketed = Quantiles.assignBuckets(df, "score", 10)
    val counts = bucketed.groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (1L to 10L).toSet, counts.toString)
    // t-digest on a uniform range: buckets within a loose balance band
    assert(counts.values.forall(c => c > 50 && c < 200), counts.toString)
    assert(counts.values.sum == 1000)
  }

  test("binning is monotone in the value") {
    val df = spark.range(0, 500).select(col("id"),
      (col("id") % 97).cast("double").as("score"))
    val rows = Quantiles.assignBuckets(df, "score", 5)
      .select("score", "bucket").distinct()
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((v1, b1), (v2, b2)) =>
        assert(b1 <= b2, s"bucket dropped: ($v1,$b1) -> ($v2,$b2)")
      case _ => ()
    }
  }

  test("no global window in the plan (the 100 TB contract)") {
    val df = spark.range(0, 100).select(col("id"),
      col("id").cast("double").as("score"))
    val plan = Quantiles.assignBuckets(df, "score", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"plan sorts globally:\n$plan")
    // shape: one aggregate (the digest) + a broadcast NLJ + projection
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ties land in the lower bucket") {
    // 8 identical values + 2 outliers: the tied mass must share one
    // bucket, not straddle a cut
    val df = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 9.0, 10.0)
      .toDF("score")
    val counts = Quantiles.assignBuckets(df, "score", 2)
      .groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 8L, counts.toString)
  }
}
