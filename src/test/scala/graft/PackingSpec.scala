package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("bins are assigned by running offset within each shard") {
    val df = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 300L), ("s1", 3L, 300L),
      ("s1", 4L, 50L), ("s2", 1L, 900L), ("s2", 2L, 200L))
      .toDF("src", "id", "n")
    val out = Packing.byRunningOffset(df, "src", "id", "n", 500L)
      .select("src", "id", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // s1 offsets: 0,300,600,900 → bins 0,0,1,1; s2: 0,900 → 0,1
    assert(out == Set(
      ("s1", 1L, 0L), ("s1", 2L, 0L), ("s1", 3L, 1L), ("s1", 4L, 1L),
      ("s2", 1L, 0L), ("s2", 2L, 1L)))
  }

  test("offset packing leaves no empty bins and bounds overflow by one doc") {
    val df = (1 to 200).map(i => ("s", i.toLong, 7L)).toDF("src", "id", "n")
    val bins = Packing.byRunningOffset(df, "src", "id", "n", 50L)
      .groupBy("bin").agg(sum("n").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bins are contiguous 0..max
    assert(bins.keySet == (0L until bins.size).toSet)
    // every bin holds ≥ budget − (doc − 1) and < budget + doc tokens
    bins.foreach { case (b, tok) =>
      if (b < bins.size - 1) assert(tok >= 50L - 6 && tok < 50L + 7,
        s"bin $b has $tok tokens")
    }
  }

  test("budget must be positive") {
    val df = Seq(("s", 1L, 1L)).toDF("src", "id", "n")
    intercept[IllegalArgumentException](
      Packing.byRunningOffset(df, "src", "id", "n", 0L))
  }

  test("pre-existing _off/bin columns are rejected, not overwritten") {
    val withBin = Seq(("s", 1L, 1L, 9L)).toDF("src", "id", "n", "bin")
    val e = intercept[IllegalArgumentException](
      Packing.byRunningOffset(withBin, "src", "id", "n", 10L))
    assert(e.getMessage.contains("bin"))
    val withOff = Seq(("s", 1L, 1L, 9L)).toDF("src", "id", "n", "_off")
    intercept[IllegalArgumentException](
      Packing.byRunningOffset(withOff, "src", "id", "n", 10L))
  }

  test("null and negative token counts fail loudly, even on a shard's last row") {
    def msgs(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    val neg = Seq(("s", 1L, 5L), ("s", 2L, -1L), ("s", 3L, 5L))
      .toDF("src", "id", "n")
    val e = intercept[Exception](
      Packing.byRunningOffset(neg, "src", "id", "n", 10L).collect())
    assert(msgs(e).contains("non-negative"), msgs(e))
    // a null on the LAST row never enters any running-sum frame — the
    // bin gate must still catch it
    val lastNull = Seq(("s", 1L, Some(5L)), ("s", 2L, Option.empty[Long]))
      .toDF("src", "id", "n")
    val e2 = intercept[Exception](
      Packing.byRunningOffset(lastNull, "src", "id", "n", 10L).collect())
    assert(msgs(e2).contains("non-null"), msgs(e2))
  }
}
