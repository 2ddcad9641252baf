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

  test("setOps is exact below k (the sketch IS the hash set)") {
    val a = (1 to 30).toDF("k")   // A = 1..30
    val b = (21 to 50).toDF("k")  // B = 21..50, |A∩B| = 10, |A∪B| = 50
    val r = KmvSketch.setOps(a, "k", b, "k", 64).head()
    assert(r.getLong(0) == 50L, s"union: $r")
    assert(r.getLong(1) == 10L, s"inter: $r")
    assert(r.getLong(2) == 10L)  // k_both
    assert(r.getLong(3) == 50L)  // union_seen
  }

  test("setOps estimates land in the error band at scale") {
    // |A| = 20k, |B| = 20k, overlap 10k → union 30k, inter 10k
    val a = spark.range(0, 20000).select(col("id").as("k"))
    val b = spark.range(10000, 30000).select(col("id").as("k"))
    val r = KmvSketch.setOps(a, "k", b, "k", 256).head()
    val (u, i) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(u - 30000) / 30000 < 0.19, s"union $u")
    // the ratio estimator compounds union error with binomial rho
    // noise at k=256 — allow a wider band for the intersection
    assert(math.abs(i - 10000) / 10000 < 0.35, s"inter $i")
  }

  test("setOps is deterministic and partitioning-invariant") {
    val a = spark.range(5000).select(col("id").as("k"))
    val b = spark.range(2500, 7500).select(col("id").as("k"))
    val r1 = KmvSketch.setOps(a, "k", b, "k", 64).head()
    val r2 = KmvSketch.setOps(a.repartition(13), "k",
      b.repartition(7), "k", 64).head()
    assert(r1 == r2)
  }

  test("setOps rejects a non-power-of-two k") {
    val df = (1 to 10).toDF("k")
    intercept[IllegalArgumentException] {
      KmvSketch.setOps(df, "k", df, "k", 100)
    }
  }

  test("plan: partial distinct before the shuffle, global TakeOrdered") {
    val df = spark.range(1000).select(col("id").as("k"))
    val plan = KmvSketch.distinctEstimate(df, "k", 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("NULL keys are NOT COUNTED (a null hash would steal a " +
    "k-minimum slot and skew every estimate)") {
    val clean = spark.range(500).select(col("id").cast("string").as("k"))
    val dirty = clean.union(Seq.fill(5)(null.asInstanceOf[String])
      .toDF("k"))
    // identical sketches and identical estimates, nulls or not
    assert(KmvSketch.sketch(dirty, "k", 64).collect().map(_.getLong(0))
      .toSeq == KmvSketch.sketch(clean, "k", 64).collect()
      .map(_.getLong(0)).toSeq)
    assert(KmvSketch.distinctEstimate(dirty, "k", 64).collect().toSeq ==
      KmvSketch.distinctEstimate(clean, "k", 64).collect().toSeq)
  }

}
