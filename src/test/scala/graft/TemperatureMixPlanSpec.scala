package graft

/** x11's thresholds frame feeds both the report and the mix filter;
  * the two subtrees must stay plan-identical so Catalyst's exchange
  * reuse runs the count-per-source aggregate ONCE. (Measured: persist
  * instead of reuse costs ~2x the whole query at sf0.1.) */
class TemperatureMixPlanSpec extends SparkTestBase {
  test("x11 runs one count-per-source aggregate, reused") {
    val df = SparkEntry.queries("x11_temperature_mix")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"thresholds aggregate not deduplicated:\n$plan")
    graft.operators.Broadcasting.releaseAll()
  }
}
