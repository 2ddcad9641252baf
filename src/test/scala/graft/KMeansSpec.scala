package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** Two well-separated 2-d blobs around (0,0) and (10,10). */
  private def blobs = Seq(
    (0L, Array(0.1f, 0.2f)), (1L, Array(-0.2f, 0.1f)),
    (2L, Array(0.0f, -0.1f)),
    (10L, Array(10.1f, 9.9f)), (11L, Array(9.8f, 10.2f)),
    (12L, Array(10.0f, 10.0f)))
    .toDF("vec_id", "embedding")

  test("separates two obvious blobs with deterministic seeds") {
    val out = KMeans.centroidRows(blobs, k = 2, iters = 2).collect()
    // 2 clusters x 2 dims
    assert(out.length == 4)
    val byC = out.groupBy(_.getLong(0))
    assert(byC.keySet == Set(0L, 1L))
    // both seeds come from the low blob, but one Lloyd round pulls a
    // centroid to each blob (classic behavior with k=2)
    val cnts = byC.view.mapValues(_.head.getLong(3)).toMap
    assert(cnts.values.sum == 6)
    assert(cnts.values.toSet == Set(3L), s"uneven split: $cnts")
    // centroid of the far blob ~ (10, 10) in e6
    val far = byC.values.find(r =>
      math.abs(r.head.getLong(2)) > 5000000L).get
    assert(far.map(_.getLong(2)).forall(v =>
      v > 9500000L && v < 10500000L), far.mkString(","))
  }

  test("assignment ties break to the lowest centroid id") {
    // a point equidistant from both seeds
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(2.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f))) // exactly between seeds 0 and 1
      .toDF("vec_id", "embedding")
    val out = KMeans.centroidRows(df, k = 2, iters = 1).collect()
    val cnts = out.groupBy(_.getLong(0)).view
      .mapValues(_.head.getLong(3)).toMap
    // vec 2 must land in cluster 0 (lowest id wins the tie)
    assert(cnts == Map(0L -> 2L, 1L -> 1L), cnts.toString)
  }

  test("iterating changes nothing once assignments are stable") {
    val a = KMeans.centroidRows(blobs, k = 2, iters = 2)
      .collect().map(_.toSeq)
    val b = KMeans.centroidRows(blobs, k = 2, iters = 4)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
