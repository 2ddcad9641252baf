package graft

import graft.operators.MinHashLsh
import org.apache.spark.sql.functions._

/** Unit pins for the MinHash/LSH core shapes. The d-family oracle
  * queries protect candidate-pair OUTPUTS on the documents fixture;
  * these pin the structural invariants a fixture can miss (mutation
  * survivor M1: mislabeling band 1 as band 0 conflated band BUCKETS
  * yet barely moved the fixture's pair set). */
class MinHashLshSpec extends SparkTestBase {
  import spark.implicits._

  test("bands: each signature row fans out to bands 0..3, each " +
    "carrying ITS OWN minhash pair (mutation survivor M1)") {
    val df = Seq(("d1", "a b c d e")).toDF("id", "text")
    val sig = MinHashLsh.signatures(df, "id", "text")
    val s = sig.collect().head
    val mh = (0 to 7).map(i => s.getAs[Long](s"mh$i"))
    val b = MinHashLsh.bands(sig, "id")
      .select("band", "k1", "k2").as[(Int, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // four DISTINCT band ids — a duplicated label would merge two
    // bands' bucket spaces and invent cross-band candidate buckets
    assert(b.map(_._1) == Seq(0, 1, 2, 3), b)
    assert(b == Seq(
      (0, mh(0), mh(1)), (1, mh(2), mh(3)),
      (2, mh(4), mh(5)), (3, mh(6), mh(7))), b)
  }

  test("bucketPairs never emits self-pairs and orders a < b") {
    val out = Seq(Seq("x", "y", "z")).toDF("ids")
      .select(expr(MinHashLsh.bucketPairs("ids")).as("p"))
      .select(explode(col("p")).as("e"))
      .select(col("e.a"), col("e.b")).as[(String, String)]
      .collect().toSet
    assert(out == Set(("x", "y"), ("x", "z"), ("y", "z")), out)
  }
}
