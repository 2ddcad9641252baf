package graft

import graft.operators.{IvfIndex, SyntheticEmbeddings}
import graft.streaming.IvfIndexMaintenance
import org.apache.spark.sql.functions._

/** The streaming twin of the batch IVF faces: appending embedding
  * micro-batches must yield an index row-identical to IvfIndex.build
  * on the final corpus (so searches match exactly), and replays must
  * be exactly-once. Centroids train once on a bootstrap sample —
  * they are the quantizer and never mutate. */
class IvfIndexMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = SyntheticEmbeddings
    .clustered(spark, n = 60, dims = 8, centers = 4, sep = 6.0)
    .select("vec_id", "embedding")

  test("incremental index equals the batch build; searches match") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_stream").toString + "/index"
    // bootstrap centroids on the first third — the quantizer
    val boot = corpus.filter(col("vec_id") < 20)
    val centroids = IvfIndex.buildCentroids(boot, k = 4, iters = 2)
    // three waves, driven via processBatch (the foreachBatch body)
    Seq(0L -> (0L, 20L), 1L -> (20L, 40L), 2L -> (40L, 60L)).foreach {
      case (id, (lo, hi)) =>
        IvfIndexMaintenance.processBatch(
          corpus.filter(col("vec_id") >= lo && col("vec_id") < hi),
          id, centroids, dir)
    }
    val streamed = IvfIndexMaintenance.index(spark, dir).get
      .select("cluster_id", "vec_id")
      .as[(Int, Long)].collect().toSet
    val batch = IvfIndex.build(corpus, centroids)
      .select("cluster_id", "vec_id")
      .as[(Int, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    assert(streamed.map(_._1).size > 1, "degenerate single-cluster fixture")
    // search equivalence, probes from every wave
    val probes = corpus.filter(col("vec_id").isin(1L, 25L, 55L))
    val viaStream = IvfIndexMaintenance
      .search(spark, dir, centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaBatch = IvfIndex.search(IvfIndex.build(corpus, centroids),
        centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaStream == viaBatch)
    assert(viaStream.nonEmpty)
  }

  test("maintain() drives the same appends through a real stream") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_live").toString + "/index"
    val centroids = IvfIndex.buildCentroids(
      corpus.filter(col("vec_id") < 20), k = 4, iters = 2)
    val in = MemoryStream[(Long, Array[Float])]
    val q = IvfIndexMaintenance.maintain(
        in.toDF().toDF("vec_id", "embedding"), centroids, dir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("ivf_live_ck").toString)
      .start()
    try {
      val rows = corpus.as[(Long, Array[Float])].collect()
      Seq(rows.filter(_._1 < 30), rows.filter(_._1 >= 30)).foreach {
        wave => in.addData(wave.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = IvfIndexMaintenance.index(spark, dir).get
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    val batch = IvfIndex.build(corpus, centroids)
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    assert(streamed == batch, s"live-stream index diverged")
  }

  test("drift gauges: a mid-stream distribution shift moves " +
    "ivf.mean_dist while bootstrap-region searches stay pinned") {
    import graft.streaming.ProgressMetrics
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_drift").toString + "/index"
    val centroids = IvfIndex.buildCentroids(
      corpus.filter(col("vec_id") < 20), k = 4, iters = 2)
    val m = new ProgressMetrics // gauges need no listener wiring
    // wave 0: the bootstrap distribution — assignment is tight
    IvfIndexMaintenance.processBatch(corpus, 0L, centroids, dir,
      metrics = Some(m))
    val probes = corpus.filter(col("vec_id").isin(1L, 25L, 55L))
    val before = IvfIndexMaintenance
      .search(spark, dir, centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // wave 1: the ingest distribution walks away — same generator,
    // every dimension shifted by +4 (off every bootstrap center)
    val drifted = SyntheticEmbeddings
      .clustered(spark, n = 60, dims = 8, centers = 4, sep = 6.0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x + 4.0d as float))")
          .as("embedding"))
    IvfIndexMaintenance.processBatch(drifted, 1L, centroids, dir,
      metrics = Some(m))
    // the rebuild trigger: mean assigned-centroid distance jumps
    val dist = m.gauge("ivf.mean_dist")
    assert(dist.map(_._1) == Seq(0L, 1L), s"gauge series: $dist")
    val (d0, d1) = (dist(0)._2, dist(1)._2)
    assert(d0 >= 0 && d1 > 3 * d0,
      s"drift must move the gauge: batch0=$d0 batch1=$d1")
    val ent = m.gauge("ivf.entropy")
    assert(ent.size == 2 && ent.forall(e => !e._2.isNaN),
      s"entropy gauge incomplete: $ent")
    // …while recall on the bootstrap distribution stays pinned: the
    // same probes return the SAME neighbors after the drifted wave
    // (far-off vectors enter the index but crack no bootstrap top-k),
    // and the maintained index still equals a batch build
    val after = IvfIndexMaintenance
      .search(spark, dir, centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(after == before,
      s"bootstrap search drifted:\nbefore=$before\nafter=$after")
    val viaBatch = IvfIndex.search(
        IvfIndex.build(corpus.unionByName(drifted), centroids),
        centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(after == viaBatch)
  }

  test("compaction folds postings into a cluster_id-bucketed dir: " +
    "index and searches identical, listing bounded") {
    import graft.streaming.BatchDirs
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_compact").toString + "/index"
    val ref = java.nio.file.Files
      .createTempDirectory("ivf_compact_ref").toString + "/index"
    val centroids = IvfIndex.buildCentroids(
      corpus.filter(col("vec_id") < 20), k = 4, iters = 2)
    // four waves, cadence 2 → compactions after batches 1 and 3
    Seq(0L -> (0L, 15L), 1L -> (15L, 30L), 2L -> (30L, 45L),
      3L -> (45L, 60L)).foreach { case (id, (lo, hi)) =>
        val wave =
          corpus.filter(col("vec_id") >= lo && col("vec_id") < hi)
        IvfIndexMaintenance.processBatch(wave, id, centroids, dir,
          compactEvery = 2, nBuckets = 8)
        IvfIndexMaintenance.processBatch(wave, id, centroids, ref)
    }
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def names: Seq[String] = fs
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSeq.sorted
    // processBatch folds up to batchId−1 (the current batch's marker
    // must survive for replay), so the coverage lands at 2; the
    // tiered default folds each cadence's tail into an L0 run
    // (batch=1/2 this call — their dirs keep one call of grace;
    // batch=0 was swept as the PREVIOUS call's debris) — bounded,
    // and the strictly-above-coverage read rule below proves nothing
    // is ever double-counted
    // the cascade merged the comparable second run into the first:
    // the chain is l0=2.f-1; its two inputs keep one call of grace
    assert(names == Seq("batch=1", "batch=2", "batch=3",
      "l0=0.f-1.n8", "l0=2.f-1.n8", "l0=2.f0.n8"),
      s"expected coverage-2 L0 chain + one grace generation: $names")
    // the production layout sentence, as directories: postings
    // bucketed by (hashed) cluster_id in every folded tier
    val sub = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/l0=2.f-1.n8"))
      .map(_.getPath.getName).filter(_.startsWith("pbucket=")).toSeq
    assert(sub.nonEmpty, "L0 run is not pbucket-partitioned")
    val got = IvfIndexMaintenance.index(spark, dir).get
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    val want = IvfIndexMaintenance.index(spark, ref).get
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    assert(got == want && got.size == 60, "compaction changed the index")
    val probes = corpus.filter(col("vec_id").isin(1L, 25L, 55L))
    val viaCompact = IvfIndexMaintenance
      .search(spark, dir, centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaRef = IvfIndexMaintenance
      .search(spark, ref, centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaCompact == viaRef && viaCompact.nonEmpty)
    // the bucketed layout's payoff: the pruned search equals the
    // full scan (a candidate shares its probe's cluster, hence its
    // bucket), and the bucket filter demonstrably reaches the scan
    // (an empty bucket list reads zero rows from the compacted part)
    val viaPruned = IvfIndexMaintenance
      .searchPruned(spark, dir, centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaPruned == viaCompact, "pruned search diverged")
    // the bucket filter reaches the COMPACTED part (empty bucket list
    // → zero of its rows); the uncompacted tail (batch=3, 15 rows) is
    // always read whole — it is cadence-bounded, not index-sized
    val emptyProbe = BatchDirs.readCommitted(spark, dir,
      pbuckets = Some(Seq.empty)).get
    assert(emptyProbe.filter(col("batch") <= 2L).count() == 0L,
      "pbucket filter did not reach the compacted scan")
    assert(emptyProbe.count() == 15L,
      "recent tail must stay visible regardless of bucket pruning")
    // replaying the final (committed) batch re-runs only the
    // idempotent sweep, which removes the grace generation's debris
    // (next-fold-sweeps rule) — the index view is unchanged
    IvfIndexMaintenance.processBatch(
      corpus.filter(col("vec_id") >= 45L), 3L, centroids, dir,
      compactEvery = 2, nBuckets = 8)
    assert(names == Seq("batch=3", "l0=2.f-1.n8"),
      s"replay's sweep should clear the grace debris: $names")
    assert(IvfIndexMaintenance.index(spark, dir).get
      .select("cluster_id", "vec_id").as[(Int, Long)].collect()
      .toSet == got)
    assert(BatchDirs.compactedThrough(spark, dir) == 2L)
  }

  test("replaying a committed batch is a no-op; a torn batch is " +
    "invisible until it commits") {
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_replay").toString + "/index"
    val centroids = IvfIndex.buildCentroids(corpus, k = 4, iters = 1)
    def wave(id: Long, lo: Long, hi: Long): Unit =
      IvfIndexMaintenance.processBatch(
        corpus.filter(col("vec_id") >= lo && col("vec_id") < hi),
        id, centroids, dir)
    wave(0L, 0L, 30L)
    val n0 = IvfIndexMaintenance.index(spark, dir).get.count()
    wave(0L, 0L, 30L) // replay: _SUCCESS gates it off
    assert(IvfIndexMaintenance.index(spark, dir).get.count() == n0)
    // torn batch: a dir without the marker must not surface
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/batch=9"))
    assert(IvfIndexMaintenance.index(spark, dir).get.count() == n0)
    wave(9L, 30L, 60L) // the replay overwrites and commits
    assert(IvfIndexMaintenance.index(spark, dir).get.count() == 60L)
  }

  test("checkpoint restart across a compaction boundary: batch ids " +
    "resume over the compacted layout, index intact") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_rsc").toString + "/index"
    val ck = java.nio.file.Files
      .createTempDirectory("ivf_rsc_ck").toString
    val centroids = IvfIndex.buildCentroids(
      corpus.filter(col("vec_id") < 20), k = 4, iters = 2)
    val rows = corpus.as[(Long, Array[Float])].collect()
    val in = MemoryStream[(Long, Array[Float])]
    def start() = IvfIndexMaintenance.maintain(
        in.toDF().toDF("vec_id", "embedding"), centroids, dir,
        compactEvery = 2, nBuckets = 8)
      .option("checkpointLocation", ck).start()
    // run 1: two waves — the cadence folds through batch 0, the
    // stream stops on a compacted layout + grace debris
    val q1 = start()
    try {
      Seq(rows.filter(_._1 < 20), rows.filter(r => r._1 >= 20 &&
        r._1 < 40)).foreach { w =>
        in.addData(w.toSeq: _*); q1.processAllAvailable() }
    } finally q1.stop()
    assert(graft.streaming.BatchDirs
      .compactedThrough(spark, dir) == 0L,
      "fixture must stop on a compacted index")
    // run 2: same checkpoint resumes at batch 2 over the compact dir
    val q2 = start()
    try { in.addData(rows.filter(_._1 >= 40).toSeq: _*)
      q2.processAllAvailable() }
    finally q2.stop()
    val streamed = IvfIndexMaintenance.index(spark, dir).get
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    val batch = IvfIndex.build(corpus, centroids)
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    assert(streamed == batch && streamed.size == 60,
      "restart across compaction lost or duplicated postings")
  }

  test("rebuild re-keys every committed posting to retrained " +
    "centroids in a fresh dir; the resumed stream appends above " +
    "the bootstrap via idOffset") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val oldDir = java.nio.file.Files
      .createTempDirectory("ivf_rb_old").toString + "/index"
    val newDir = java.nio.file.Files
      .createTempDirectory("ivf_rb_new").toString + "/index"
    val boot = IvfIndex.buildCentroids(
      corpus.filter(col("vec_id") < 20), k = 4, iters = 2)
    // the drift-gauge fixture: a second wave entirely off the
    // bootstrap centers — the state in which the gauges say rebuild
    val drifted = SyntheticEmbeddings
      .clustered(spark, n = 60, dims = 8, centers = 4, sep = 6.0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x + 4.0d as float))")
          .as("embedding"))
    IvfIndexMaintenance.processBatch(corpus, 0L, boot, oldDir)
    IvfIndexMaintenance.processBatch(drifted, 1L, boot, oldDir)
    // retrain the quantizer on the full accumulated distribution,
    // rebuild into the fresh dir
    val full = corpus.unionByName(drifted)
    val c2 = IvfIndex.buildCentroids(full, k = 4, iters = 2)
    assert(IvfIndexMaintenance.rebuild(spark, oldDir, c2, newDir)
      == 120L)
    // row-identical to a batch build under the new quantizer …
    val got = IvfIndexMaintenance.index(spark, newDir).get
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    val want = IvfIndex.build(full, c2)
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    assert(got == want, "rebuilt index diverged from the batch build")
    // … so searches match the batch index exactly, including probes
    // from the drifted region the OLD quantizer had no centers for
    val probes = full.filter(col("vec_id").isin(1L, 1025L))
    val viaRebuilt = IvfIndexMaintenance
      .search(spark, newDir, c2, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val viaBatch = IvfIndex.search(IvfIndex.build(full, c2),
        c2, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaRebuilt == viaBatch && viaRebuilt.nonEmpty)
    // the old dir is untouched — in-flight readers drain against it
    assert(IvfIndexMaintenance.index(spark, oldDir).get.count()
      == 120L)
    // a rebuild must FAIL FAST into any dir already holding committed
    // index state: readers union every committed dir, so an aborted
    // earlier rebuild's leftovers would silently merge into the view
    intercept[IllegalArgumentException] {
      IvfIndexMaintenance.rebuild(spark, oldDir, c2, newDir)
    }
    intercept[IllegalArgumentException] {
      IvfIndexMaintenance.rebuild(spark, oldDir, c2, oldDir)
    }
    // resume the stream over the rebuilt dir through a REAL query
    // with a fresh checkpoint: idOffset=1 keys the engine's batch 0
    // as batch=1, so the bootstrap's batch=0 commit marker is not
    // mistaken for the new stream's first commit (which would
    // silently drop its rows)
    val nextWave = SyntheticEmbeddings
      .clustered(spark, n = 30, dims = 8, centers = 4, sep = 6.0)
      .select((col("vec_id") + 2000L).as("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val in = MemoryStream[(Long, Array[Float])]
    val q = IvfIndexMaintenance.maintain(
        in.toDF().toDF("vec_id", "embedding"), c2, newDir,
        idOffset = 1L)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("ivf_rb_ck").toString)
      .start()
    try { in.addData(nextWave.toSeq: _*); q.processAllAvailable() }
    finally q.stop()
    val ix = IvfIndexMaintenance.index(spark, newDir).get
    assert(ix.count() == 150L,
      "resumed stream's first batch was skipped or duplicated")
    assert(graft.streaming.BatchDirs.readCommitted(spark, newDir).get
      .select("batch").distinct().as[Long].collect().toSet
      == Set(0L, 1L), "idOffset did not key the resumed stream above the bootstrap")
  }
}
