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

  /** Every query + oracle in the suite assumes these EXACT loaded
    * schemas. Testdata regenerations have silently drifted before
    * (events.ts: nanos → TIMESTAMP_NTZ broke 7 queries in one round);
    * this pin turns the next drift into a red sbt test naming the
    * table, instead of a cascade of downstream analysis errors. If
    * the driver's testdata legitimately changes, update the DDL here
    * AND re-run the full oracle compare. */
  test("loaded schemas match the pinned DDL for every table") {
    val expected = Map(
      "region" -> "r_regionkey INT,r_name STRING",
      "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
      "customer" -> ("c_custkey BIGINT,c_name STRING,c_nationkey INT," +
        "c_acctbal DOUBLE,c_mktsegment STRING"),
      "supplier" -> ("s_suppkey BIGINT,s_name STRING,s_nationkey INT," +
        "s_acctbal DOUBLE"),
      "part" -> ("p_partkey BIGINT,p_name STRING,p_brand STRING," +
        "p_type STRING,p_size INT,p_retailprice DOUBLE"),
      "orders" -> ("o_orderkey BIGINT,o_custkey BIGINT," +
        "o_orderstatus STRING,o_totalprice DOUBLE," +
        "o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"),
      "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT," +
        "l_suppkey BIGINT,l_linenumber INT,l_quantity DOUBLE," +
        "l_extendedprice DOUBLE,l_discount DOUBLE,l_tax DOUBLE," +
        "l_returnflag STRING,l_linestatus STRING," +
        "l_shipdate TIMESTAMP_NTZ"),
      "events" -> ("event_id BIGINT,ts TIMESTAMP,user_id BIGINT," +
        "event_type STRING,value DOUBLE,props STRING"),
      "documents" -> ("doc_id BIGINT,text STRING,lang STRING," +
        "source STRING,n_chars BIGINT"),
      "embeddings" -> ("vec_id BIGINT,embedding ARRAY<FLOAT>," +
        "label INT"))
    Tables.all.foreach { name =>
      val got = Tables.load(spark, "/root/testdata/sf0.001", name)
        .schema.toDDL.replace(" NOT NULL", "")
      assert(got == expected(name),
        s"TESTDATA DRIFT in $name:\n  got      $got\n  expected ${
          expected(name)}")
    }
  }

  test("loadEvents sets the legacy nanos flag ONLY when the footer " +
    "needs it - a micros file leaves session state untouched") {
    import org.apache.spark.sql.functions._
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val dir = java.nio.file.Files.createTempDirectory("ev_micros")
      .toString
    spark.range(5).select(col("id").as("event_id"),
      expr("timestamp_micros(id * 1000000)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val before = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      assert(Tables.load(spark, dir, "events").count() == 5)
      // the key stays at its registered default ("false") — getOption
      // surfaces the default, so assert the VALUE, not absence
      assert(spark.conf.get(key) == "false",
        "reading a non-nanos events file must not mutate the session")
    } finally before.foreach(spark.conf.set(key, _))
  }

}
