package graft

import graft.operators.CmsSketch
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val words =
    (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(5)("gamma") ++ Seq("delta", "epsilon")).toDF("w")

  test("estimates are upper bounds on true counts and exact without collisions") {
    val truth = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 5L,
      "delta" -> 1L, "epsilon" -> 1L)
    val est = CmsSketch.estimates(
      CmsSketch.counters(words, "w"), words.select("w").distinct(), "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated $k: ${est(k)} < $n")
    }
    // 5 keys in a 4×256 grid: collisions are possible in principle but
    // not for these fixed md5 buckets — assert exactness to pin the
    // hash arithmetic (a changed bucket function breaks this loudly)
    assert(est == truth)
  }

  test("topK returns heavy hitters in estimate-desc, key-asc order") {
    val top = CmsSketch.topK(words, "w", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("alpha", 50L))
    assert(top(1) == ("beta", 20L))
    assert(top(2) == ("gamma", 5L))
  }

  test("per-key topK spelling equals the row-spelling pipeline (r21)") {
    // r21 refactor pin: topK now aggregates per key before hashing
    // (md5 once per DISTINCT key, one scan). It must equal the
    // original composition over raw rows exactly — counters are
    // associative sums, so the per-key weights change nothing.
    val viaRows = CmsSketch.estimates(
        CmsSketch.counters(words, "w"), words.select("w").distinct(), "w")
      .orderBy(col("est").desc, col("w"))
      .limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaKeys = CmsSketch.topK(words, "w", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaKeys == viaRows, s"$viaKeys vs $viaRows")
  }

  test("typed aggregator builds the identical counter grid") {
    val agg = new CmsSketch.CmsAggregator
    val sketch = words.as[String].select(agg.toColumn).head()
    // relational counters pivoted into the same flat array
    val grid = new Array[Long](CmsSketch.Depth * CmsSketch.Width)
    CmsSketch.counters(words, "w").collect().foreach { r =>
      grid(r.getAs[Int]("i") * CmsSketch.Width +
        r.getAs[Long]("bucket").toInt) = r.getAs[Long]("c")
    }
    assert(sketch.toSeq == grid.toSeq,
      "Aggregator and relational paths diverged")
    // driver-side probe of the materialized sketch
    assert(CmsSketch.estimateFrom(sketch, "alpha") == 50L)
    assert(CmsSketch.estimateFrom(sketch, "beta") == 20L)
  }

  test("sketch size is bounded: counters ≤ Depth×Width regardless of input") {
    val big = spark.range(100000)
      .select(col("id").cast("string").as("w"))
    val n = CmsSketch.counters(big, "w").count()
    assert(n <= CmsSketch.Depth * CmsSketch.Width,
      s"counter frame has $n rows")
  }

  test("partial aggregation: the shuffle carries counters, not rows") {
    val plan = CmsSketch.counters(words, "w")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no map-side combine in plan:\n$plan")
  }
}
