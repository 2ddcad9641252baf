package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def big = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    .toDF("k", "v")
  private def small = Seq(2L, 4L, 99L).toDF("sk")

  test("semi join equals the plain left_semi result") {
    val out = BloomJoin.semiJoin(big, small, "k", "sk")
      .select("k").as[Long].collect().toSet
    assert(out == Set(2L, 4L))
  }

  test("anti join equals the plain left_anti result") {
    val out = BloomJoin.antiJoin(big, small, "k", "sk")
      .select("k").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 5L))
  }

  test("null big keys survive the anti join and never match the semi") {
    val withNull = big.unionByName(
      Seq((Option.empty[Long], "n")).toDF("k", "v"))
    assert(BloomJoin.antiJoin(withNull, small, "k", "sk")
      .filter(col("k").isNull).count() == 1L)
    assert(BloomJoin.semiJoin(withNull, small, "k", "sk")
      .filter(col("k").isNull).count() == 0L)
  }

  test("null small keys set no bits and join nothing") {
    val smallWithNull = Seq(Some(2L), None).toDF("sk")
    val out = BloomJoin.semiJoin(big, smallWithNull, "k", "sk")
      .select("k").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  test("membership test has no false negatives") {
    val keys = (0L until 2000L).map(k => Tuple1(k)).toDF("k")
    val bloom = BloomJoin.build(keys, "k", numBits = 1 << 16)
    assert(keys.filter(BloomJoin.mightContain(bloom, col("k")))
      .count() == 2000L)
  }

  test("false-positive rate stays near design at capacity") {
    val keys = (0L until 2000L).map(k => Tuple1(k)).toDF("k")
    val bloom = BloomJoin.build(keys, "k", numBits = 1 << 16)
    // 2000 keys in 64Ki bits ≈ the 500k/4M design load → fpp ≈ 1%
    val probes = (100000L until 102000L).map(k => Tuple1(k)).toDF("k")
    val fp = probes.filter(BloomJoin.mightContain(bloom, col("k"))).count()
    assert(fp < 100L, s"false-positive count $fp out of 2000 probes")
  }

  test("parameters are validated") {
    intercept[IllegalArgumentException](
      BloomJoin.build(small, "sk", numBits = 100))
    intercept[IllegalArgumentException](
      BloomJoin.build(small, "sk", numHashes = 0))
  }

  test("exactness holds even with a tiny saturated filter") {
    // 64 bits for 2000 keys: nearly every probe is a bloom candidate,
    // so correctness must come from the exact join, not the filter.
    val keys = (0L until 2000L).map(k => Tuple1(k)).toDF("k")
    val facts = (1500L until 2500L).map(k => Tuple1(k)).toDF("k2")
    val semi = BloomJoin.semiJoin(facts, keys, "k2", "k",
      numBits = 64, numHashes = 1).select("k2").as[Long].collect().toSet
    assert(semi == (1500L until 2000L).toSet)
    val anti = BloomJoin.antiJoin(facts, keys, "k2", "k",
      numBits = 64, numHashes = 1).select("k2").as[Long].collect().toSet
    assert(anti == (2000L until 2500L).toSet)
  }
}
