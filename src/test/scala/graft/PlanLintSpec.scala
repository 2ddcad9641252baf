package graft

/** Suite-wide physical-plan lint: NO query in the driver registry may
  * plan a CartesianProduct. The suite's deliberate tiny cross joins
  * (teleport N, scalar aggregates, k-row codebooks) are all spelled
  * `crossJoin(broadcast(...))`, which plans as a
  * BroadcastNestedLoopJoin — so any CartesianProduct is a real
  * corpus×corpus product that would be a scale-killer at 100 TB,
  * caught here the round it appears instead of in a manual plan
  * audit. (Per-query shape guards live in NewQueryPlanSpec; this is
  * the registry-wide floor.)
  */
class PlanLintSpec extends SparkTestBase {

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, build) =>
        val plan =
          try build(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          finally graft.operators.Broadcasting.releaseAll()
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"CartesianProduct planned by: ${offenders.mkString(", ")}")
  }
}
