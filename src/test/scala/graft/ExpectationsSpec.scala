package graft

import graft.operators.Expectations
import graft.operators.Expectations.Rule
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0)), (2L, Some(-5.0)), (3L, None), (4L, Some(7.0)))
    .toDF("id", "v")

  test("violation counts per rule; null predicate = violation") {
    val out = Expectations.check(df, Seq(
      Rule("v_positive", col("v") > 0),
      Rule("v_positive_or_null", col("v").isNull || col("v") > 0),
      Rule("id_present", col("id").isNotNull)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    // v > 0: -5 fails, null is UNKNOWN → violation
    assert(out("v_positive") == (2L, false))
    assert(out("v_positive_or_null") == (1L, false))
    assert(out("id_present") == (0L, true))
  }

  test("one corpus pass: a single aggregate carries every rule") {
    val plan = Expectations.check(df, Seq(
      Rule("a", col("v") > 0), Rule("b", col("id") < 100),
      Rule("c", col("v").isNotNull)))
      .queryExecution.optimizedPlan.toString
    // all rules fold into one Aggregate node over one scan
    assert(plan.split("Aggregate").length <= 3, plan) // ≤2 occurrences
  }

  test("enforce passes clean data through and raises on breach") {
    val clean = Expectations.enforce(df, Seq(
      Rule("id_present", col("id").isNotNull)))
    assert(clean.count() == 4)
    val ex = intercept[IllegalStateException] {
      Expectations.enforce(df, Seq(Rule("v_positive", col("v") > 0)))
    }
    assert(ex.getMessage.contains("v_positive") &&
      ex.getMessage.contains("2 violations"), ex.getMessage)
    // tolerance admits bounded dirt
    val tolerated = Expectations.enforce(df,
      Seq(Rule("v_positive", col("v") > 0)), tolerance = 2)
    assert(tolerated.count() == 4)
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(
        Rule("x", col("v") > 0), Rule("x", col("id") > 0)))
    }
  }

  test("rule names with dots resolve (no nested-field misparse)") {
    val out = Expectations.check(df, Seq(
        Rule("v.positive", col("v") > 0),
        Rule("id.in range", col("id") <= 4)))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out == Map("v.positive" -> 2L, "id.in range" -> 0L))
  }

  test("backticks in rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(Rule("a`b", col("v") > 0)))
    }
  }
}
