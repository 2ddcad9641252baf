package graft

/** Smoke: every declared query runs on sf0.001 and returns rows (full
  * value correctness is the driver's DuckDB gate at sf0.01 — see
  * tools/verify_local.sh). Queries whose filters legitimately yield no
  * rows at this tiny scale are exempted from the rows>0 check. */
class QueriesSmokeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"
  private val mayBeEmpty = Set("d2_ngram_jaccard", "d4_lsh_pairs",
    "d6_simhash_pairs", "d11_containment", "v3_cos_neardup",
    "j7_missing_flag")

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql covers every query (or is consciously rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
