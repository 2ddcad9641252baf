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

  test("k-means|| init: deterministic, k centers, converges like the default") {
    def initOnce() = KMeans.parallelInitE6(blobs, k = 2, rounds = 2,
      seed = 7L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("c")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    // same seed → byte-identical init, twice
    val i1 = initOnce()
    assert(rows(i1) == rows(initOnce()))
    assert(i1.count() == 2)
    // seeds land one per blob (weighted farthest-first), so the fit
    // converges to the same optimum as the proven default init
    def sig(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getSeq[Long](1).toSeq, r.getLong(2))).toSet
    val viaParallel = sig(KMeans.fitE6(blobs, 2, 2, Some(initOnce())))
    val viaDefault = sig(KMeans.fitE6(blobs, 2, 2))
    assert(viaParallel == viaDefault,
      s"parallel=$viaParallel default=$viaDefault")
  }

  test("k-means|| handles fewer candidates than k and tiny corpora") {
    val two = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // k=4 > corpus size: init returns what exists, fit still runs
    val init = KMeans.parallelInitE6(two, k = 4, rounds = 2, seed = 1L)
    assert(init.count() == 2)
    val out = KMeans.fitE6(two, 4, 1, Some(init)).collect()
    assert(out.map(_.getLong(2)).sum == 2)
  }

  test("iterating changes nothing once assignments are stable") {
    val a = KMeans.centroidRows(blobs, k = 2, iters = 2)
      .collect().map(_.toSeq)
    val b = KMeans.centroidRows(blobs, k = 2, iters = 4)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
