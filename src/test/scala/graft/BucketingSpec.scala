package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  test("bucketed join plans with no Exchange (co-located, no shuffle)") {
    val sf = "/root/testdata/sf0.001"
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    Bucketing.writeBucketed(l, "bkt_lineitem", "k", 4)
    Bucketing.writeBucketed(o, "bkt_orders", "k", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_lineitem",
        "bkt_orders", "k")
      // disable broadcast so the planner must pick SMJ, then prove the
      // bucket layout removed both shuffles
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try joined.queryExecution.executedPlan.toString
        finally spark.conf
          .set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() ==
        Tables.load(spark, sf, "lineitem").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }
}
