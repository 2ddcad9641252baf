package graft

import org.apache.spark.sql.types.{StringType, TimestampType}

/** Guards against testdata schema drift: events.parquet's physical `ts`
  * encoding has changed across generations (nanos-as-long → TIMESTAMP_NTZ);
  * Tables.loadEvents must always surface a session-TZ TimestampType so every
  * downstream event-time query (t1/t2/t3, j9, p4, a5, f15) analyzes. A new
  * encoding should fail HERE, loudly, not in the driver's correctness run.
  */
class TablesSpec extends SparkTestBase {

  test("loadEvents normalizes ts to TimestampType regardless of file encoding") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must be session-TZ timestamp, got ${ev.schema("ts").dataType}")
    assert(ev.schema.fieldNames.contains("props"))
    assert(ev.count() > 0)
  }

  test("loadEvents timestamps are sane and queryable") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // micros arithmetic (the pattern the event-time queries rely on)
    val r = ev.select(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).collect().head
    assert(r.getLong(0) > 0L && r.getLong(1) >= r.getLong(0))
    // window() over ts must analyze (this is what broke in r8)
    val w = ev.groupBy(window(col("ts"), "1 hour")).count()
    assert(w.count() > 0)
  }

  test("every declared table loads with non-empty schema") {
    Tables.all.foreach { name =>
      val df = Tables.load(spark, "/root/testdata/sf0.001", name)
      assert(df.schema.nonEmpty, s"$name has empty schema")
      assert(df.schema.forall(f => f.dataType != StringType || f.name.nonEmpty))
    }
  }
}
