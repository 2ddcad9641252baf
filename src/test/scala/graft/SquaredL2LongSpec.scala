package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

class SquaredL2LongSpec extends SparkTestBase {
  import spark.implicits._

  private def register() = GraftFunctions.register(spark)

  test("graft_l2sq matches the interpreted HOF fold exactly") {
    register()
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
      .select(expr(
        """transform(embedding,
          |  x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"""
          .stripMargin).as("v"))
    val mismatches = df.crossJoin(df.limit(3).select(col("v").as("w")))
      .select(
        expr("graft_l2sq(v, w)").as("native"),
        expr("""aggregate(zip_with(v, w, (a, b) -> (a - b) * (a - b)),
               | cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin)
          .as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("mixed long/int arrays and exact small cases") {
    register()
    val r = Seq((Array(1L, 2L, 3L), Array(3, 2, 1)))
      .toDF("a", "b")
      .select(expr("graft_l2sq(a, b)")).collect().head.getLong(0)
    assert(r == 4L + 0L + 4L)
  }

  test("null array, null element, and length mismatch yield null") {
    register()
    val rows = spark.sql(
      """SELECT
        | graft_l2sq(cast(null as array<bigint>), array(1L)) AS n1,
        | graft_l2sq(array(1L, cast(null as bigint)), array(1L, 2L)) AS n2,
        | graft_l2sq(array(1L), array(1L, 2L)) AS n3""".stripMargin)
      .collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }

  test("non-integral arrays are rejected at analysis") {
    register()
    intercept[Exception] {
      spark.sql("SELECT graft_l2sq(array(1.5d), array(1.0d))").collect()
    }
  }

  test("compiles under forced codegen (no silent interpreter fallback)") {
    register()
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        "SELECT graft_l2sq(array(5L, 1L), array(1L, 4L)) AS d")
        .collect().head.getLong(0)
      assert(r == 16L + 9L)
    } finally
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
