package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

class DotProductDoubleSpec extends SparkTestBase {
  import spark.implicits._

  private def register() = GraftFunctions.register(spark)

  test("graft_dot matches the interpreted HOF fold bit-for-bit") {
    register()
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val mismatches = df.select(
      expr("graft_dot(embedding, embedding)").as("native"),
      expr("""aggregate(zip_with(embedding, embedding,
             | (x, y) -> cast(x as double) * cast(y as double)),
             | cast(0.0 as double), (a, b) -> a + b)""".stripMargin)
        .as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("mixed float/long arrays promote per element") {
    register()
    val r = Seq((Array(1.5f, 2.0f), Array(2L, 3L))).toDF("a", "b")
      .select(expr("graft_dot(a, b)")).collect().head.getDouble(0)
    assert(r == 1.5 * 2 + 2.0 * 3)
  }

  test("null array, null element, and length mismatch yield null") {
    register()
    val rows = spark.sql(
      """SELECT
        | graft_dot(cast(null as array<double>), array(1.0d)) AS n1,
        | graft_dot(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) AS n2,
        | graft_dot(array(1.0d), array(1.0d, 2.0d)) AS n3""".stripMargin)
      .collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }

  test("non-numeric arrays are rejected at analysis") {
    register()
    intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
  }

  test("decimal-element arrays compile under forced codegen") {
    register()
    // (double)(Decimal) is invalid Java — a bad cast here would fail
    // the whole stage's compilation and silently fall back to
    // interpreted execution. CODEGEN_ONLY turns that fallback into a
    // hard error, so this asserts the generated code actually compiles.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        """SELECT graft_dot(
          |  array(cast(1.5 as decimal(10,2)), cast(2.5 as decimal(10,2))),
          |  array(cast(2.0 as decimal(10,2)), cast(4.0 as decimal(10,2))))
          |  AS d""".stripMargin).collect().head.getDouble(0)
      assert(r == 1.5 * 2.0 + 2.5 * 4.0)
      // mixed decimal × double promotes per element too
      val m = spark.sql(
        """SELECT graft_dot(
          |  array(cast(1.5 as decimal(10,2))), array(2.0d)) AS d"""
          .stripMargin).collect().head.getDouble(0)
      assert(m == 3.0)
    } finally
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("codegen and interpreted paths agree") {
    register()
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val withCodegen = df.select(expr("graft_dot(a, b)"))
      .collect().head.getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try df.select(expr("graft_dot(a, b)")).collect().head.getDouble(0)
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(withCodegen == interpreted && withCodegen == 32.0)
  }
}
