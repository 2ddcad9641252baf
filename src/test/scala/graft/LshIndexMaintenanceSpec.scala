package graft

import graft.operators.MinHashLsh
import graft.streaming.LshIndexMaintenance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming twin of d4_lsh_pairs: per-batch index maintenance
  * must (a) reproduce the batch operator's candidate set on the
  * final corpus, (b) absorb post-crash batch replays exactly-once,
  * and (c) only ever broadcast the NEW batch's bands — the index
  * side never shuffles. */
class LshIndexMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  // three near-dup families spread across batches so pairs form
  // within AND across batches
  private val b1 = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again today ok",
    2L -> "the quick brown fox jumps over the lazy dog again today yes",
    10L -> "spark plans shuffle exchanges and broadcast joins at scale")
  private val b2 = Seq(
    3L -> "the quick brown fox jumps over the lazy dog again today no",
    11L -> "spark plans shuffle exchanges and broadcast joins at scales")
  private val b3 = Seq(
    12L -> "spark plans shuffle exchanges and broadcast joins at scaled",
    20L -> "completely unrelated words about cooking pasta and sauces")

  private def dirs(tag: String): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"lsh_ix_$tag").toString
    (s"$base/index", s"$base/pairs")
  }

  test("union of per-batch pair outputs equals batch d4 on the " +
    "final corpus") {
    implicit val sql = spark.sqlContext
    val (ix, pr) = dirs("stream")
    val in = MemoryStream[(Long, String)]
    // compactEvery=2: batch 1 trips a mid-stream compaction, so this
    // equivalence also covers the real foreachBatch → compact path
    val q = LshIndexMaintenance.maintain(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", ix, pr,
        compactEvery = 2, nBuckets = 8)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lsh_ck").toString)
      .start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable() // one micro-batch per family wave
      }
    } finally q.stop()
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val corpus = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(batch.nonEmpty, "fixture produced no candidate pairs")
    assert(streamed == batch,
      s"stream=$streamed\nbatch=$batch")
    // cross-batch pairs really happened (not all within one batch)
    assert(streamed.exists { case (a, b, _) => a == 1L && b == 3L },
      s"expected the cross-batch near-dup (1,3): $streamed")
  }

  test("checkpoint restart resumes batch ids — no re-emission, no " +
    "lost index bands") {
    // the T2 face for the index maintainer: stop after wave 1,
    // restart the SAME checkpoint, feed waves 2-3 — the committed
    // batch must not replay (ids resume at 1), and the final state
    // must still equal the batch operator on the full corpus
    implicit val sql = spark.sqlContext
    val (ix, pr) = dirs("restart")
    val ck = java.nio.file.Files
      .createTempDirectory("lsh_rs_ck").toString
    val in = MemoryStream[(Long, String)]
    def start() = LshIndexMaintenance.maintain(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", ix, pr)
      .option("checkpointLocation", ck).start()
    val q1 = start()
    try { in.addData(b1: _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try {
      in.addData(b2: _*); q2.processAllAvailable()
      in.addData(b3: _*); q2.processAllAvailable()
    } finally q2.stop()
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val corpus = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // every doc's 4 bands indexed exactly once across the restart
    val idx = LshIndexMaintenance.readIndex(spark, ix).get
    assert(idx.count() == (b1 ++ b2 ++ b3).size * 4L)
    assert(idx.select("batch").distinct().count() == 3L,
      "batch ids did not resume across the restart")
  }

  test("checkpoint restart across a compaction boundary: batch ids " +
    "resume, nothing re-emits, the compacted view stays intact") {
    implicit val sql = spark.sqlContext
    val (ix, pr) = dirs("rs_compact")
    val ck = java.nio.file.Files
      .createTempDirectory("lsh_rsc_ck").toString
    val in = MemoryStream[(Long, String)]
    def start() = LshIndexMaintenance.maintain(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", ix, pr,
        compactEvery = 2, nBuckets = 8)
      .option("checkpointLocation", ck).start()
    // run 1: waves 0 and 1 — the cadence fires after batch 1 and
    // folds through batch 0, so the stream STOPS holding a compacted
    // index + grace debris + batch 1
    val q1 = start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b: _*); q1.processAllAvailable() }
    } finally q1.stop()
    assert(graft.streaming.BatchDirs.compactedThrough(spark, ix) == 0L,
      "fixture must stop on a compacted index")
    // run 2: the SAME checkpoint resumes at batch 2; its face 2
    // probes the compacted index and its cadence fires again
    val q2 = start()
    try {
      in.addData(b3: _*); q2.processAllAvailable()
      in.addData(30L -> "fresh unrelated text about woodworking")
      q2.processAllAvailable()
    } finally q2.stop()
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val corpus = (b1 ++ b2 ++ b3 ++
      Seq(30L -> "fresh unrelated text about woodworking"))
      .toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // every doc's 4 bands exactly once across restart + compaction
    assert(LshIndexMaintenance.readIndex(spark, ix).get.count()
      == (b1 ++ b2 ++ b3).size * 4L + 4L)
    // the cross-restart, cross-compaction pair: doc 1 folded in run
    // 1, doc 3 arrived after the restart
    assert(streamed.exists { case (a, b, _) => a == 1L && b == 3L },
      s"cross-restart pair missing: $streamed")
  }

  test("replaying a committed batch is a no-op; a half-written batch " +
    "overwrites cleanly") {
    val (ix, pr) = dirs("replay")
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(
        batch.toDF("doc_id", "text"), id, "doc_id", "text", ix, pr)
    run(b1, 0L); run(b2, 1L)
    val before = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val ixBefore = LshIndexMaintenance.readIndex(spark, ix)
      .get.count()
    // replay of a COMMITTED batch: gated off by the band _SUCCESS
    run(b2, 1L)
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before)
    assert(LshIndexMaintenance.readIndex(spark, ix).get.count()
      == ixBefore, "replay duplicated index bands")
    // crash BETWEEN the pair write and the band commit: simulate by
    // deleting batch 1's band dir (pairs left behind), then replay —
    // the batch must re-run and converge to the same state
    val fs = new org.apache.hadoop.fs.Path(ix).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ix/batch=1"), true)
    // while torn, the batch's pairs are INVISIBLE (gated on the band
    // commit) even though the pair parquet sits fully readable
    val torn = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    assert(torn != before && torn.subsetOf(before),
      s"torn batch leaked into pairsSoFar: $torn")
    run(b2, 1L)
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before)
    assert(LshIndexMaintenance.readIndex(spark, ix).get.count()
      == ixBefore)
  }

  private def lsNames(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  test("compaction: pairsSoFar and readIndex identical across a " +
    "compaction; listing cost bounded by compacted + recent") {
    import graft.streaming.BatchDirs
    val (ix, pr) = dirs("compact")
    val (ix0, pr0) = dirs("compact_ref") // uncompacted twin
    def run(base: (String, String), batch: Seq[(Long, String)],
      id: Long, every: Int): Unit =
      LshIndexMaintenance.processBatch(batch.toDF("doc_id", "text"),
        id, "doc_id", "text", base._1, base._2, compactEvery = every,
        nBuckets = 8)
    // ids 0-2 with cadence 3 → compaction fires after batch 2, and
    // folds THROUGH batch 1 only: the in-flight batch's dir is its
    // replay marker and is never folded; folded dirs survive one
    // grace generation for concurrent readers (two-phase sweep).
    // The tiered default folds the tail into an L0 run — the main
    // compacted table (none yet) is never rewritten by a minor fold
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      run((ix, pr), b, i.toLong, every = 3)
      run((ix0, pr0), b, i.toLong, every = 0)
    }
    assert(lsNames(ix).sorted ==
      Seq("batch=0", "batch=1", "batch=2", "l0=1.f-1.n8"),
      s"first generation: fold ≤ batchId-1, retain grace dirs: " +
        s"${lsNames(ix)}")
    val got = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val ref = LshIndexMaintenance.pairsSoFar(spark, pr0, ix0)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref && got.nonEmpty,
      s"compaction changed pairsSoFar: got=$got ref=$ref")
    val ixRows = LshIndexMaintenance.readIndex(spark, ix).get
      .select("doc_id", "band", "k1", "k2", "batch")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val ixRef = LshIndexMaintenance.readIndex(spark, ix0).get
      .select("doc_id", "band", "k1", "k2", "batch")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    assert(ixRows == ixRef, "compaction changed the band index")
    // two more batches on top of the compact dir: reads must see
    // compact + recent; the listing is O(1 + recent), not O(batches)
    val b4 = Seq(4L -> ("the quick brown fox jumps over the lazy " +
      "dog again today eh"))
    val b5 = Seq(30L -> "fresh totally novel text about gardening")
    run((ix, pr), b4, 3L, every = 3)
    run((ix, pr), b5, 4L, every = 3)
    run((ix0, pr0), b4, 3L, every = 0)
    run((ix0, pr0), b5, 4L, every = 0)
    assert(lsNames(ix).sorted == Seq("batch=0", "batch=1", "batch=2",
      "batch=3", "batch=4", "l0=1.f-1.n8"),
      s"no cadence point passed — listing unchanged + 2 recents: " +
        s"${lsNames(ix)}")
    val got2 = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val ref2 = LshIndexMaintenance.pairsSoFar(spark, pr0, ix0)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == ref2, s"got=$got2 ref=$ref2")
    // the cross-compaction pair (1,4): 1's bands live in the compact
    // dir, 4 arrived after — the pruned face-2 scan must find it
    assert(got2.exists { case (a, b, _) => a == 1L && b == 4L },
      s"pair probing the COMPACTED index is missing: $got2")
    // the second minor fold appends another L0 run and sweeps the
    // FIRST fold's debris (two-phase): listing stays bounded by the
    // L0 run count + 2 cadences of batch dirs at any point
    run((ix, pr), Seq(31L -> "one more row to trip the cadence"), 5L,
      every = 3)
    // the second minor's run was size-comparable to the first, so
    // the cascade merged them: the chain is ONE run covering (-1, 4],
    // with both inputs lingering one call as grace
    assert(lsNames(ix).sorted == Seq("batch=2", "batch=3", "batch=4",
      "batch=5", "l0=1.f-1.n8", "l0=4.f-1.n8", "l0=4.f1.n8"),
      s"${lsNames(ix)}")
    val got3 = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    // direct single-tier folds (ratio 0 → every fold a major)
    // converge the whole tiered layout to a single compact dir in
    // two calls — call N sweeps what call N-1 made redundant (the
    // L0 runs folded by the major survive one call as grace) — and
    // never change the view; idempotent at the fixpoint
    val c1 = BatchDirs.compact(spark, ix, 5L, "k1", 8)
    assert(c1 == 5L && lsNames(ix).sorted ==
      Seq("batch=5", "compact=5.n8", "l0=4.f-1.n8"),
      s"${lsNames(ix)}")
    val c2 = BatchDirs.compact(spark, ix, 5L, "k1", 8)
    assert(c2 == 5L && lsNames(ix) == Seq("compact=5.n8"),
      s"${lsNames(ix)}")
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == got3,
      "re-running compaction changed the view")
    // full-corpus equivalence against the batch operator, compacted
    val corpus = (b1 ++ b2 ++ b3 ++ b4 ++ b5 ++
      Seq(31L -> "one more row to trip the cadence"))
      .toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(got3 == batch, s"stream=$got3\nbatch=$batch")
  }

  test("out-of-band compactNow between micro-batches: same candidate " +
    "set as the batch operator, cross-compaction pairs included") {
    val (ix, pr) = dirs("oob")
    // cadence OFF — folds come only from the maintenance-job face
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(batch.toDF("doc_id", "text"),
        id, "doc_id", "text", ix, pr, compactEvery = 0, nBuckets = 8)
    run(b1, 0L); run(b2, 1L)
    // a maintenance job folds through batch 0 between micro-batches
    // (first fold always proceeds)
    assert(LshIndexMaintenance.compactNow(spark, ix, pr, 0L, 8) == 0L)
    // the next micro-batch probes the COMPACTED index (face 2's
    // pinned pruned read) and must still find cross-batch pairs
    run(b3, 2L)
    // folding the NEWEST committed batch is refused: it may still
    // replay, and folding it would destroy the replay marker (the
    // guard is the API's enforcement of the cadence-path rule)
    intercept[IllegalArgumentException] {
      LshIndexMaintenance.compactNow(spark, ix, pr, 2L, 8)
    }
    // …but a maintenance job racing stream startup (empty dir) is a
    // graceful no-op, not a crash
    val (ix2, pr2) = dirs("oob_empty")
    assert(LshIndexMaintenance.compactNow(spark, ix2, pr2, 0L, 8)
      == -1L)
    // another out-of-band fold; the byte-ratio governor may fold or
    // defer here — both are correct, the view must not change either
    // way
    LshIndexMaintenance.compactNow(spark, ix, pr, 1L, 8)
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val corpus = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // the pair probing across the fold boundary really happened:
    // doc 1 (batch 0, folded) ⋈ doc 3 (batch 1, post-fold tail)
    assert(streamed.exists { case (a, b, _) => a == 1L && b == 3L },
      s"cross-compaction pair missing: $streamed")
  }

  test("pairsFor prunes the compacted pairs scan to the canonical " +
    "ids' buckets and equals the pairsSoFar filter everywhere") {
    import graft.streaming.BatchDirs
    val (ix, pr) = dirs("pfor")
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(batch.toDF("doc_id", "text"),
        id, "doc_id", "text", ix, pr, compactEvery = 3, nBuckets = 8)
    // cadence 3 → pairs fold through batch 1; batch 2's pairs stay
    // in the recent tail, so the lookup face is exercised over BOTH
    // storage locations
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      run(b, i.toLong) }
    assert(BatchDirs.compactedThrough(spark, pr) == 1L,
      "fixture should leave a compacted pairs dir + a tail")
    val all = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    assert(all.nonEmpty)
    // every canonical id: the pruned point lookup returns exactly
    // the full view filtered to it (compact-resident and
    // tail-resident canonicals both)
    all.map(_._1).foreach { id =>
      val got = LshIndexMaintenance.pairsFor(spark, pr, ix, Seq(id))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == all.filter(_._1 == id), s"doc_a=$id: $got")
    }
    // multi-id lookup with an absent id mixed in
    val multi = LshIndexMaintenance
      .pairsFor(spark, pr, ix, Seq(1L, 999L))
      .as[(Long, Long, Long)].collect().toSet
    assert(multi == all.filter(_._1 == 1L), s"$multi")
    // empty lookup: zero rows (and zero compacted buckets scanned)
    assert(LshIndexMaintenance.pairsFor(spark, pr, ix, Nil)
      .count() == 0L)
  }

  test("pairsFor prunes correctly when the stream's doc ids are " +
    "not LongType: the bucket hash derives on the STORED type") {
    import graft.streaming.BatchDirs
    val (ix, pr) = dirs("pint")
    // an IntegerType id stream: xxhash64 is type-width-sensitive, so
    // compact() buckets by the INT hash — a LongType-derived lookup
    // bucket set would prune to the wrong dirs and silently lose
    // compact-resident pairs
    def run(batch: Seq[(Int, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(batch.toDF("doc_id", "text"),
        id, "doc_id", "text", ix, pr, compactEvery = 2, nBuckets = 8)
    run(b1.map { case (k, v) => (k.toInt, v) }, 0L)
    run(b2.map { case (k, v) => (k.toInt, v) }, 1L)
    assert(BatchDirs.compactedThrough(spark, pr) == 0L,
      "fixture should compact the int-keyed pairs")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("cast(doc_a as long)", "cast(doc_b as long)",
        "n_shared_bands")
      .as[(Long, Long, Long)].collect().toSet
    val all = norm(LshIndexMaintenance.pairsSoFar(spark, pr, ix))
    assert(all.nonEmpty)
    all.map(_._1).foreach { id =>
      val got = norm(LshIndexMaintenance.pairsFor(spark, pr, ix,
        Seq(id)))
      assert(got == all.filter(_._1 == id),
        s"int-keyed lookup for doc_a=$id diverged: $got")
    }
  }

  test("pairsFor survives a marker-only pairs fold: all-empty-batch " +
    "ranges commit no data files, and the stored-type derivation " +
    "must fall back instead of crashing on schema inference") {
    import graft.streaming.BatchDirs
    import org.apache.spark.sql.functions.col
    val (ix, pr) = dirs("pempty")
    // three mutually-unrelated docs: bands commit, ZERO pairs — the
    // pairs batch dirs carry markers but no part files
    def run(docs: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(docs.toDF("doc_id", "text"),
        id, "doc_id", "text", ix, pr, compactEvery = 0, nBuckets = 8)
    run(Seq(1L -> "entirely solitary prose about glaciers"), 0L)
    run(Seq(2L -> "unrelated notes on fermentation timing"), 1L)
    // fold through batch 0: the pairs tier is committed MARKER-ONLY
    assert(LshIndexMaintenance.compactNow(spark, ix, pr, 0L, 8) == 0L)
    assert(BatchDirs.compactedThrough(spark, pr) == 0L)
    assert(BatchDirs.genDataDirs(spark, pr,
      BatchDirs.generation(spark, pr)).isEmpty,
      "fixture must produce a data-less pairs fold")
    // the lookup face on the marker-only layout: no crash, no rows
    assert(LshIndexMaintenance.pairsFor(spark, pr, ix, Seq(1L))
      .count() == 0L)
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix).count() == 0L)
    // and once real pairs arrive on the tail, the same faces see them
    run(Seq(3L -> "entirely solitary prose about glaciers too"), 2L)
    val got = LshIndexMaintenance.pairsFor(spark, pr, ix, Seq(1L))
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got == LshIndexMaintenance
      .pairsSoFar(spark, pr, ix).filter(col("doc_a") === 1L)
      .as[(Long, Long, Long)].collect().toSet)
  }

  test("compaction safety: uncommitted compact dirs are invisible; " +
    "stray batch=tmp debris never wedges a reader") {
    import graft.streaming.BatchDirs
    val (ix, pr) = dirs("cdebris")
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(batch.toDF("doc_id", "text"),
        id, "doc_id", "text", ix, pr)
    run(b1, 0L); run(b2, 1L)
    val before = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val fs = new org.apache.hadoop.fs.Path(ix).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a torn compaction (no _SUCCESS) must not change any read
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$ix/compact=9.n8"))
    assert(BatchDirs.compactedThrough(spark, ix) == -1L)
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ix/compact=9.n8"), true)
    // stray non-numeric dir (manual debris): readers skip, not throw
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$ix/batch=tmp"))
    fs.create(new org.apache.hadoop.fs.Path(s"$ix/batch=tmp/_SUCCESS"),
      true).close()
    assert(BatchDirs.committedIds(spark, ix).sorted == Seq(0L, 1L))
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before)
    // and compaction sweeps around it without touching it: the fold
    // call retains its own inputs one generation (two-phase sweep),
    // the next call converges — batch=tmp untouched throughout
    BatchDirs.compact(spark, ix, 1L, "k1", 8)
    assert(lsNames(ix).sorted ==
      Seq("batch=0", "batch=1", "batch=tmp", "compact=1.n8"),
      s"${lsNames(ix)}")
    BatchDirs.compact(spark, ix, 1L, "k1", 8)
    assert(lsNames(ix).sorted == Seq("batch=tmp", "compact=1.n8"),
      s"${lsNames(ix)}")
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before,
      "compaction changed the candidate-pair view")
  }

  test("compactNow with a fully-folded index still catches up a " +
    "lagging pairs tail (crash between the two folds), capped at " +
    "the band coverage") {
    import graft.streaming.BatchDirs
    val (ix, pr) = dirs("pcatch")
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(batch.toDF("doc_id", "text"),
        id, "doc_id", "text", ix, pr, compactEvery = 0, nBuckets = 8)
    run(b1, 0L); run(b2, 1L); run(b3, 2L)
    val before = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    assert(before.nonEmpty)
    // simulate a backfill-style fold that covered EVERY index batch
    // (the quiet-period state: no committed index dir above the
    // coverage) while the pairs side stayed untouched — e.g. a crash
    // between foldBoth's two folds after a fold-everything backfill
    assert(BatchDirs.compactTiered(spark, ix, 2L, "k1",
      nBuckets = 8) == 2L)
    assert(BatchDirs.compactedThrough(spark, pr) == -1L,
      "fixture broken: pairs must start unfolded")
    // the re-run, at the BOUNDARY upTo (== band coverage == newest
    // pairs id): the index side has nothing left to fold (returns
    // −1, the documented no-op) — the pairs tail must still be
    // folded, and the cap must honor the pairs side's OWN
    // never-fold-the-newest rule (batch 2 may replay; folding it
    // here would destroy its marker — and handing upTo=2 straight
    // to the guard crashed with IllegalArgumentException before the
    // three-way cap)
    assert(LshIndexMaintenance.compactNow(spark, ix, pr, 2L, 8) == -1L)
    assert(BatchDirs.compactedThrough(spark, pr) == 1L,
      "pairs tail must catch up to newest−1, no further")
    // the invariant held throughout, and the view is unchanged
    assert(BatchDirs.compactedThrough(spark, pr) <=
      BatchDirs.compactedThrough(spark, ix))
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before,
      "pairs catch-up changed the candidate-pair view")
    // idempotent: nothing left on either side is a clean no-op —
    // at the capped upTo and at the boundary alike
    assert(LshIndexMaintenance.compactNow(spark, ix, pr, 1L, 8) == -1L)
    assert(LshIndexMaintenance.compactNow(spark, ix, pr, 2L, 8) == -1L)
    assert(BatchDirs.compactedThrough(spark, pr) == 1L)
  }
}
