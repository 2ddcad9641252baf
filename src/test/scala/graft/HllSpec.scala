package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._

class HllSpec extends SparkTestBase {
  import spark.implicits._

  test("estimate tracks true cardinality within HLL error bounds") {
    // p=8 → relative standard error ~1.04/sqrt(256) ≈ 6.5%; allow 4σ
    for (n <- Seq(100, 1000, 20000)) {
      val df = spark.range(n).select(col("id").cast("string").as("k"))
      val est = Hll.estimate(Hll.registers(df, "k"))
      assert(math.abs(est - n) < math.max(0.26 * n, 20.0),
        s"n=$n est=$est")
    }
  }

  test("registers are deterministic and merge by element-wise max") {
    val a = spark.range(0, 5000)
      .select(col("id").cast("string").as("k"))
    val b = spark.range(2500, 7500)
      .select(col("id").cast("string").as("k"))
    val union = spark.range(0, 7500)
      .select(col("id").cast("string").as("k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("register").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // same input → identical registers
    assert(rows(Hll.registers(a, "k")) == rows(Hll.registers(a, "k")))
    // merge(a, b) == registers(a ∪ b): the sketch is mergeable, so
    // per-shard sketches compose without re-reading data
    assert(rows(Hll.merge(Hll.registers(a, "k"), Hll.registers(b, "k")))
      == rows(Hll.registers(union, "k")))
  }

  test("duplicates do not move the estimate") {
    val once = spark.range(1000).select(col("id").cast("string").as("k"))
    val thrice = once.union(once).union(once)
    assert(Hll.estimate(Hll.registers(once, "k")) ==
      Hll.estimate(Hll.registers(thrice, "k")))
  }

  test("NULL values are NOT COUNTED (a null register row would " +
    "crash estimate and corrupt merges)") {
    val clean = spark.range(800).select(col("id").cast("string").as("k"))
    val dirty = clean.union(Seq.fill(3)(null.asInstanceOf[String])
      .toDF("k"))
    assert(Hll.estimate(Hll.registers(dirty, "k")) ==
      Hll.estimate(Hll.registers(clean, "k")))
  }

}
