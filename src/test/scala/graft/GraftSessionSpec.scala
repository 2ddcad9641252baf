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
}
