package graft

import graft.operators.Broadcasting
import org.apache.spark.sql.functions._

class BroadcastingSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(joined: org.apache.spark.sql.DataFrame) =
    joined.queryExecution.executedPlan.toString

  test("small frames get the broadcast hint") {
    val big = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
    val dim = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val joined = big.join(Broadcasting.maybeBroadcast(dim), Seq("k"))
    assert(planOf(joined).contains("BroadcastHashJoin"))
  }

  test("frames past the cap do NOT get the hint — shuffle join instead of driver OOM") {
    val big = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
    val dim = (1 to 500).map(i => (i, "x" * 100)).toDF("k", "name")
    // tiny cap forces the degrade path; also disable auto-broadcast so
    // the planner can't re-add it from its own estimate
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = big.join(
        Broadcasting.maybeBroadcast(dim, maxBytes = 16), Seq("k"))
      val plan = planOf(joined)
      assert(!plan.contains("Broadcast"),
        s"oversized frame still broadcast:\n$plan")
      assert(joined.count() == 500)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
