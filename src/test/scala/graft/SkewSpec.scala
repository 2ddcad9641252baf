package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals direct groupBy") {
    val l = Tables.load(spark, sf, "lineitem")
    val direct = l.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedCountSum(l, "l_returnflag", "l_quantity", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_suppkey").as("k"), col("l_quantity"))
    val s = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = l.join(s, "k").count()
    val salted = Skew.saltedJoin(l, s, "k", 4).count()
    assert(salted == plain)
  }

  test("salt is deterministic — no nondeterministic expression feeds the shuffle") {
    // A nondeterministic salt used as a grouping/join key silently
    // duplicates or drops rows under stage retry (SPARK-23207 class).
    val l = Tables.load(spark, sf, "lineitem")
    val agg = Skew.saltedCountSum(l, "l_returnflag", "l_quantity", 8)
    val join = Skew.saltedJoin(
      l.select(col("l_suppkey").as("k"), col("l_quantity")),
      Tables.load(spark, sf, "supplier")
        .select(col("s_suppkey").as("k"), col("s_name")),
      "k", 4)
    for (df <- Seq(agg, join)) {
      val nondet = df.queryExecution.analyzed.collect {
        case p => p.expressions.flatMap(_.collect {
          case e if !e.deterministic => e
        })
      }.flatten
      assert(nondet.isEmpty, s"nondeterministic exprs in plan: $nondet")
    }
    // and the salted result is stable across independent evaluations
    val a = agg.collect().map(_.toSeq).toSet
    val b = agg.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("map-typed columns are skipped by the default salt (hash() rejects maps)") {
    import org.apache.spark.sql.functions.{map, lit}
    val df = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .withColumn("meta", map(lit("k"), lit("v")))
    val direct = df.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedCountSum(df, "l_returnflag", "l_quantity", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("default salt refuses a frame whose only hashable column is the key") {
    // hash(key) % buckets is constant per key — salting would silently
    // do nothing; the helper must fail loudly instead
    import spark.implicits._
    val big = Seq(("a", Map("x" -> 1)), ("a", Map("y" -> 2)))
      .toDF("k", "m")
    val dim = Seq(("a", "dim")).toDF("k", "name")
    val err = intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, "k", 4)
    }
    assert(err.getMessage.contains("saltCols"))
    // explicit saltCols naming the key is the caller's own informed
    // choice — still accepted
    assert(Skew.saltedJoin(big, dim, "k", 4, saltCols = Seq("k"))
      .count() == 2)
  }

  test("saltBuckets = 0 fails loudly, never an empty join") {
    import spark.implicits._
    val big = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("k", "name")
    val ex = intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, "k", 0, saltCols = Seq("v"))
    }
    assert(ex.getMessage.contains("saltBuckets"), ex.getMessage)
    intercept[IllegalArgumentException] {
      Skew.saltedCountSum(big, "k", "k", 0, saltCols = Seq("v"))
    }
  }

}
