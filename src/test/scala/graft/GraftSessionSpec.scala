package graft

class GraftSessionSpec extends SparkTestBase {

  test("registerTables exposes every testdata table to spark.sql") {
    GraftSession.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().head.getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM documents")
      .collect().head.getLong(0) > 0)
  }

  test("graft_dot is available through sql after registration") {
    graft.expressions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("create() re-applies shuffle.partitions on a PRE-EXISTING " +
    "session (builder configs are silently dropped there)") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "200") // the default pathology
      val s = GraftSession.create(cores = 8)
      assert(s eq spark) // getOrCreate returned the existing session
      assert(s.conf.get(key) == "8",
        "the headline right-sized-shuffle knob must survive the " +
          "pre-existing-session path")
    } finally spark.conf.set(key, before)
  }

}
