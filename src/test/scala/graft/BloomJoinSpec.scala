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

  test("probe matches build bits under forced codegen and interpreted") {
    // The probe is a custom expression (BloomMightContain); make sure
    // the generated Java and the interpreted path agree with the
    // distributed build's pmod/xxhash64 arithmetic bit-for-bit.
    val keys = (0L until 512L).map(k => Tuple1(k)).toDF("k")
    val bloom = BloomJoin.build(keys, "k", numBits = 1 << 12)
    val probes = (0L until 4096L).map(k => Tuple1(k)).toDF("k")
    def hits(mode: String): Set[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try probes.filter(BloomJoin.mightContain(bloom, col("k")))
        .as[Long].collect().toSet
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = hits("CODEGEN_ONLY")
    val interp = hits("NO_CODEGEN")
    assert(gen == interp)
    assert((0L until 512L).forall(gen.contains), "false negative")
  }

  test("probe plan carries no giant array literal") {
    val keys = (0L until 512L).map(k => Tuple1(k)).toDF("k")
    val bloom = BloomJoin.build(keys, "k") // 4M-bit default
    // analyzed plan: the optimizer folds a LocalRelation filter away
    val plan = big.filter(BloomJoin.mightContain(bloom, col("k")))
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_bloom_might_contain"))
    assert(plan.length < 10000, s"plan unexpectedly large: ${plan.length}")
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
