package graft

import graft.operators.Broadcasting
import org.apache.spark.sql.functions._

class BroadcastingSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(joined: org.apache.spark.sql.DataFrame) =
    joined.queryExecution.executedPlan.toString

  /** Auto-broadcast would mask the helper entirely: with the default
    * threshold the planner broadcasts tiny frames on its own, so every
    * assertion here runs with it disabled — the ONLY possible source
    * of a broadcast is the helper's explicit hint. */
  private def withAutoBroadcastOff[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("small frames get the broadcast hint (byte gate)") {
    withAutoBroadcastOff {
      val big = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
      val dim = Seq((1, "a"), (2, "b")).toDF("k", "name")
      val joined = big.join(Broadcasting.maybeBroadcast(dim), Seq("k"))
      assert(planOf(joined).contains("BroadcastHashJoin"), planOf(joined))
    }
  }

  test("frames past the byte cap do NOT get the hint") {
    withAutoBroadcastOff {
      val big = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
      val dim = (1 to 500).map(i => (i, "x" * 100)).toDF("k", "name")
      val joined = big.join(
        Broadcasting.maybeBroadcast(dim, maxBytes = 16), Seq("k"))
      val plan = planOf(joined)
      assert(!plan.contains("Broadcast"),
        s"oversized frame still broadcast:\n$plan")
      assert(joined.count() == 500)
    }
  }

  test("count gate: small frames broadcast, oversized degrade to shuffle") {
    withAutoBroadcastOff {
      val big = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
      val dim = (1 to 50).map(i => (i, s"h$i")).toDF("k", "h")
      val small = big.join(
        Broadcasting.maybeBroadcastByCount(dim, maxRows = 100), Seq("k"))
      assert(planOf(small).contains("BroadcastHashJoin"), planOf(small))

      val wide = big.join(
        Broadcasting.maybeBroadcastByCount(dim, maxRows = 10), Seq("k"))
      val plan = planOf(wide)
      assert(!plan.contains("Broadcast"),
        s"over-count frame still broadcast:\n$plan")
      assert(wide.count() == 50)
      dim.unpersist()
    }
  }

  test("the eager count probe is rejected during lazy plan construction") {
    val dim = (1 to 10).map(i => (i, s"h$i")).toDF("k", "h")
    val e = intercept[IllegalArgumentException] {
      Broadcasting.duringConstruction {
        Broadcasting.maybeBroadcastByCount(dim, maxRows = 100)
      }
    }
    assert(e.getMessage.contains("eager"))
    // outside the guard the probe is legal again (depth unwinds)
    Broadcasting.maybeBroadcastByCount(dim, maxRows = 100)
    Broadcasting.releaseAll()
  }

  test("no SparkEntry query fires a Spark job during plan construction") {
    // Constructing every query builder under the guard proves no
    // internal call site reaches the eager probe at construction time
    // (the round-7 c6 pathology). Bounded collects (bloom/z-order/IVF)
    // still run — the guard targets only the corpus-sized probe.
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, build) =>
      val df = build(spark, dir) // wrapper applies duringConstruction
      assert(df != null, name)
    }
    graft.operators.Broadcasting.releaseAll()
  }

  test("releaseAll unpersists every count-gate cache") {
    import org.apache.spark.storage.StorageLevel
    val dim = (1 to 50).map(i => (i, s"h$i")).toDF("k", "h")
    Broadcasting.maybeBroadcastByCount(dim, maxRows = 100)
    assert(dim.storageLevel != StorageLevel.NONE,
      "count gate should have persisted the frame")
    Broadcasting.releaseAll()
    assert(dim.storageLevel == StorageLevel.NONE,
      "releaseAll should have unpersisted the tracked cache")
  }
}
