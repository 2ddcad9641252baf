package graft

import graft.operators.KmvSketch
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("below k distinct values the sketch is an exact count") {
    val df = (1 to 1000).map(i => i % 10).toDF("k")
    val r = KmvSketch.distinctEstimate(df, "k", 64).head()
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) == 10L)
  }

  test("estimate lands within the ~1/sqrt(k-2) error band") {
    val n = 20000
    val df = spark.range(n).select(col("id").cast("string").as("k"))
    val est = KmvSketch.distinctEstimate(df, "k", 256)
      .head().getLong(0).toDouble
    // 3 standard errors at k=256 ≈ 19%
    assert(math.abs(est - n) / n < 0.19,
      s"estimate $est too far from $n")
  }

  test("estimate is deterministic and partitioning-invariant") {
    val df = spark.range(5000).select(col("id").as("k"))
    val a = KmvSketch.distinctEstimate(df, "k", 64).head().getLong(0)
    val b = KmvSketch.distinctEstimate(df.repartition(17), "k", 64)
      .head().getLong(0)
    assert(a == b)
  }

  test("duplicates do not shift the estimate (distinct hashes only)") {
    val uniq = spark.range(2000).select(col("id").as("k"))
    val dup = uniq.union(uniq).union(uniq)
    val a = KmvSketch.distinctEstimate(uniq, "k", 64).head().getLong(0)
    val b = KmvSketch.distinctEstimate(dup, "k", 64).head().getLong(0)
    assert(a == b)
  }

  test("plan: partial distinct before the shuffle, global TakeOrdered") {
    val df = spark.range(1000).select(col("id").as("k"))
    val plan = KmvSketch.distinctEstimate(df, "k", 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }
}
