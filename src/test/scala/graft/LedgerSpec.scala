package graft

import graft.incremental.Ledger
import java.nio.file.Files

class LedgerSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("empty ledger → everything pending; record → anti-joined out") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/l1"
    val work = Seq("a", "b", "c", "d").toDF("wid")
    assert(Ledger.pending(work, dir, "wid").count() == 4)

    Ledger.record(spark, dir, Seq("a", "c"), Ledger.Completed, "run1")
    val left = Ledger.pending(work, dir, "wid")
      .select("wid").collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("b", "d"))
  }

  test("failed keys are excluded from work like completed ones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/l2"
    val work = Seq("x", "y", "z").toDF("wid")
    Ledger.record(spark, dir, Seq("x"), Ledger.Completed)
    Ledger.record(spark, dir, Seq("y"), Ledger.Failed)
    assert(Ledger.pending(work, dir, "wid").collect()
      .map(_.getString(0)).toSeq == Seq("z"))
    // but a completed-only view still shows the failed key
    assert(Ledger.doneKeys(spark, dir, Seq(Ledger.Completed))
      .count() == 1)
  }

  test("pendingBloom returns exactly pending (bloom only prunes)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/lb"
    val work = (1 to 200).map(i => s"w$i").toDF("wid")
    Ledger.record(spark, dir, (1 to 150).map(i => s"w$i"))
    val exact = Ledger.pending(work, dir, "wid")
      .collect().map(_.getString(0)).sorted
    val bloomed = Ledger.pendingBloom(work, dir, "wid")
      .collect().map(_.getString(0)).sorted
    assert(bloomed.toSeq == exact.toSeq)
    assert(exact.length == 50)
  }

  test("pendingBloom handles non-string work keys (probe casts)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/lbl"
    val work = (1L to 100L).toDF("wid") // LONG keys
    Ledger.record(spark, dir, (1 to 80).map(_.toString)) // string ledger
    val exact = Ledger.pending(work, dir, "wid")
      .as[Long].collect().sorted
    val bloomed = Ledger.pendingBloom(work, dir, "wid")
      .as[Long].collect().sorted
    assert(bloomed.toSeq == exact.toSeq && exact.length == 20)
  }

  test("appends across 'runs' accumulate (kill/restart no-dup model)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/l3"
    Ledger.record(spark, dir, Seq("a"), Ledger.Completed, "run1")
    Ledger.record(spark, dir, Seq("a", "b"), Ledger.Completed, "run2")
    // duplicate 'a' records collapse to one key
    assert(Ledger.doneKeys(spark, dir).count() == 2)
  }

  test("record(df) appends distributively; pending joins without a forced broadcast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/l5"
    val work = (1 to 100).map(i => s"w$i").toDF("wid")
    Ledger.record(work.filter(col("wid").isin("w1", "w2", "w3")), dir)
    assert(Ledger.pending(work, dir, "wid").count() == 97)
    assert(Ledger.doneKeys(spark, dir).count() == 3)

    // With auto-broadcast disabled the plan must NOT broadcast: a
    // forced hint would be honored regardless and OOM the driver on
    // an outsized ledger. Unhinted, AQE owns the fallback.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Ledger.pending(work, dir, "wid")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Broadcast"),
        s"pending() still broadcasts with threshold=-1:\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact collapses record files and preserves the key set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ledger").toString + "/l4"
    (1 to 10).foreach(i =>
      Ledger.record(spark, dir, Seq(s"k$i", "shared"),
        Ledger.Completed, s"run$i"))
    val before = Ledger.doneKeys(spark, dir).collect()
      .map(_.getString(0)).sorted
    Ledger.compact(spark, dir)
    val after = Ledger.doneKeys(spark, dir).collect()
      .map(_.getString(0)).sorted
    assert(after.toSeq == before.toSeq && after.length == 11)
    val parts = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(parts == 1, s"expected 1 part file after compaction, $parts")
    // ledger still appendable after compaction
    Ledger.record(spark, dir, Seq("post"), Ledger.Completed)
    assert(Ledger.doneKeys(spark, dir).count() == 12)
  }
}
