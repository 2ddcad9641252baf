package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Batch-id-keyed parquet directory layout shared by the streaming
  * index maintainers (`<dir>/batch=<id>/`, `_SUCCESS` as the commit
  * marker), plus the COMPACTION layer that keeps it production-shaped.
  * The layout IS the exactly-once mechanism: a replayed micro-batch
  * either skips (marker present) or overwrites its own directory with
  * deterministic content — nothing accumulates.
  *
  * Why compaction: a directory per micro-batch means every read (and
  * every `processBatch` index scan) pays an O(batches) driver
  * `listStatus`, and days of 1-minute triggers leave 10⁴–10⁵ tiny
  * dirs — the small-files shape that kills a 100 TB stream. [[compact]]
  * folds every committed batch ≤ cutoff into ONE consolidated dir,
  *
  *   `<dir>/compact=<cutoff>.n<buckets>/pbucket=<b>/…`
  *
  * hash-bucketed by the caller's join key (`pbucket =
  * pmod(xxhash64(key), buckets)` — k1 for LSH bands, cluster_id for
  * IVF postings), so a reader that knows which key values it probes
  * can prune the scan to the touched buckets. The original `batch` id
  * survives as a data column (cast long), so gating semantics are
  * unchanged.
  *
  * Compaction commit protocol, same marker discipline as the batches:
  *  1. write `compact=<newCutoff>` (parquet `overwrite` → `_SUCCESS`
  *     is the commit);
  *  2. only then sweep — TWO-PHASE: delete what the PREVIOUS
  *     generation made redundant; dirs folded into THIS generation
  *     survive one more compaction as a grace window for concurrent
  *     readers (see [[compact]]). A lazy frame from [[readCommitted]]
  *     must therefore be CONSUMED within one compaction cadence of
  *     being built — past two generations its pinned file listing can
  *     hit swept dirs (materialize eagerly if it must live longer).
  * A crash inside (1) leaves an unmarked dir readers ignore; a crash
  * inside (2) leaves debris that readers also ignore (they read the
  * HIGHEST committed compact + batch dirs STRICTLY ABOVE its cutoff)
  * and the next compact call sweeps. Coverage rule after compaction:
  * every batch id ≤ cutoff is committed — sound because [[compact]]
  * only ever folds committed batches and the streaming engine runs
  * batch n+1 only after n committed (synthetic-id backfills that
  * leave holes below the cutoff are out of contract, as documented on
  * the maintainers). */
object BatchDirs {

  /** `batch=<digits>` only — a stray `batch=tmp` (editor leftover,
    * manual debris) must not throw in `.toLong` and wedge every
    * reader; readCommitted shares the guard so both faces see the
    * same directory set. */
  private val BatchName = "batch=(\\d+)".r
  private val CompactName = "compact=(\\d+)\\.n(\\d+)".r

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Ids of the batches whose OWN directory under `baseDir` carries
    * the commit marker (empty batches included — a commit is a
    * commit; only READING their parquet needs the part-file guard
    * below). Batches folded into a compact dir no longer appear here,
    * EVEN while their directory lingers in the two-phase sweep's
    * one-generation grace window: ids ≤ [[compactedThrough]] are
    * filtered out (they are committed by the coverage rule, and
    * reporting them here would double-represent them to any consumer
    * that unions this list with the compacted view). One `listStatus`
    * — the cutoff is computed from the same directory listing. */
  def committedIds(spark: SparkSession, baseDir: String): Seq[Long] =
    committedState(spark, baseDir)._2

  /** (compact cutoff, committed batch ids above it) from ONE
    * directory listing — the pair every visibility gate needs.
    * Resolving the two through separate listings is a race: a
    * compaction committing in between yields a NEW cutoff with the
    * OLD (pre-fold) id list, and ids the fold just covered vanish
    * from `cutoff ∨ ids`-style gates (batches silently invisible for
    * one read). One snapshot keeps the pair mutually consistent —
    * cutoff only ever grows, so the union face stays monotone. */
  def committedState(spark: SparkSession, baseDir: String)
    : (Long, Seq[Long]) = {
    val path = new Path(baseDir)
    val fs = fsOf(spark, baseDir)
    if (!fs.exists(path)) (-1L, Nil)
    else {
      val statuses = fs.listStatus(path).toSeq.filter(_.isDirectory)
      val cutoff = statuses
        .flatMap(s => s.getPath.getName match {
          case CompactName(c, _)
            if fs.exists(new Path(s.getPath, "_SUCCESS")) =>
            Some(c.toLong)
          case _ => None
        })
        .maxOption.getOrElse(-1L)
      (cutoff, statuses
        .filter(s =>
          BatchName.pattern.matcher(s.getPath.getName).matches() &&
          fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.getName.stripPrefix("batch=").toLong)
        .filter(_ > cutoff))
    }
  }

  /** Highest committed compaction under `baseDir`: (cutoff, buckets),
    * None before the first compaction. One `listStatus` of the base
    * dir — never of the batch dirs.
    *
    * Two committed dirs can share a cutoff: an explicit bucket-count
    * change refolds the same coverage under a new modulus, and the
    * superseded dir survives one generation (sweep grace window) — or
    * a crash leaves both until the next call converges. The pick is
    * DETERMINISTIC: latest `_SUCCESS` mtime (the commit instant)
    * wins, higher bucket count breaking a same-instant tie. Both
    * candidates hold complete coverage of the cutoff, so even a
    * granularity-collapsed mtime tie picks a CORRECT layout — the
    * pick only decides which modulus pruned readers compute with, and
    * they read with the same generation they resolved. */
  def compactInfo(spark: SparkSession, baseDir: String)
    : Option[(Long, Int)] = {
    val path = new Path(baseDir)
    val fs = fsOf(spark, baseDir)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case CompactName(cutoff, n) =>
          // single getFileStatus, FNF = not committed: an exists()
          // probe followed by getFileStatus would race the sweep
          // (a grace dir deleted between the two calls crashes the
          // reader instead of dropping out of the view)
          try {
            val m = fs.getFileStatus(new Path(s.getPath, "_SUCCESS"))
            Some((cutoff.toLong, n.toInt, m.getModificationTime))
          } catch {
            case _: java.io.FileNotFoundException => None
          }
        case _ => None
      })
      .sortBy { case (c, n, t) => (c, t, n) }.lastOption
      .map { case (c, n, _) => (c, n) }
  }

  /** Recent-tail directory budget: even when the byte-ratio governor
    * defers a fold (tail too small to pay an O(index) rewrite), the
    * tail must never regrow the O(batches)-listing problem compaction
    * exists to solve — once the tail REACHES this many committed
    * batch dirs the fold proceeds regardless of byte ratio
    * (boundary spec-pinned: 63 deferrable dirs defer, 64 force). */
  private val MaxTailDirs = 64

  /** Every batch id ≤ this is committed (−1 before any compaction). */
  def compactedThrough(spark: SparkSession, baseDir: String): Long =
    compactInfo(spark, baseDir).map(_._1).getOrElse(-1L)

  /** Precondition check for OUT-OF-BAND folds (callers other than
    * the single in-band writer, whose `upTo = batchId − 1` holds by
    * construction): `upTo` must stay strictly below the newest
    * committed batch — the newest batch may still replay, and
    * folding it destroys the replay marker that makes the replay a
    * no-op (the replay would then re-emit on top of its folded
    * rows, silently double-counting). Returns false — fold is a
    * no-op — when nothing is committed yet, so a maintenance job
    * racing stream startup doesn't crash; throws on an actual
    * violation. ONE listing; shared by both maintainers so the
    * contract can never diverge between them. */
  def foldableUpTo(spark: SparkSession, baseDir: String,
    upTo: Long): Boolean = {
    val (cut, ids) = committedState(spark, baseDir)
    val newest = ids.maxOption.getOrElse(cut)
    if (newest < 0) false // nothing committed yet: no-op, not error
    else {
      require(upTo < newest,
        s"out-of-band fold upTo=$upTo must stay strictly below the " +
          s"newest committed batch ($newest): the newest batch may " +
          "still replay, and folding it destroys its replay marker")
      true
    }
  }

  /** An all-empty-batches compaction commits a marker-only dir; the
    * parquet reader must skip it (same rationale as the per-batch
    * part-file guard). Data, when present, lives under `pbucket=*`. */
  private def compactHasData(fs: FileSystem, dir: String): Boolean =
    fs.listStatus(new Path(dir)).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("pbucket="))

  /** The hash-bucket column a compacted layout partitions by. Public
    * so pruned readers compute probe buckets with the IDENTICAL
    * function (a modulus mismatch would silently drop matches). */
  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets.toLong))

  private def committedDataDirs(fs: FileSystem, baseDir: String,
    afterBatch: Long, excludeBatch: Long): Seq[String] = {
    val path = new Path(baseDir)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toSeq
      .filter { s =>
        s.isDirectory &&
        BatchName.pattern.matcher(s.getPath.getName).matches() && {
          val id = s.getPath.getName.stripPrefix("batch=").toLong
          id > afterBatch && id != excludeBatch
        } &&
        fs.exists(new Path(s.getPath, "_SUCCESS")) &&
        fs.listStatus(s.getPath).exists(f =>
          f.isFile && f.getPath.getName.startsWith("part-"))
      }
      .map(_.getPath.toString)
  }

  /** Everything committed under `baseDir` as one frame — the highest
    * committed compact dir (if any) plus the committed, non-empty
    * `batch=*` dirs above its cutoff; None when both are absent.
    * `batch` is a LongType data column in every row (partition-
    * inferred ints are cast, so the two sides union without a
    * coercion surprise). Half-written directories (no marker) are
    * excluded, so a reader never sees a torn batch — and so are
    * committed-but-EMPTY batches (marker, zero part files: an empty
    * micro-batch, e.g. a watermark-only trigger, can commit without
    * writing any data file, and feeding a file-less directory to the
    * parquet reader throws on schema inference, wedging every
    * subsequent batch).
    *
    * `pbuckets`: when the caller knows which join-key buckets it will
    * probe ([[bucketOf]] over the same key and the compact layout's
    * bucket count), the compact scan prunes to those partition dirs;
    * the recent (uncompacted) batches are always read whole — they
    * are bounded by the compaction cadence, not by stream lifetime. */
  def readCommitted(spark: SparkSession, baseDir: String,
    excludeBatch: Long = -1L, pbuckets: Option[Seq[Long]] = None)
    : Option[DataFrame] =
    readCommittedAt(spark, baseDir, compactInfo(spark, baseDir),
      excludeBatch, pbuckets)

  /** [[readCommitted]] pinned to an already-RESOLVED compact
    * generation — for callers that derive something from the
    * generation's bucket count (a pruned scan) before reading: a
    * concurrent compaction with a different bucket count must not be
    * re-resolved between the derivation and the read (buckets
    * computed for the old modulus against the new layout would
    * silently drop matches). Safe because the sweep is two-phase: a
    * superseded compact dir survives one full compaction generation
    * (see [[compact]]). */
  def readCommittedAt(spark: SparkSession,
    baseDir: String, info: Option[(Long, Int)],
    excludeBatch: Long = -1L, pbuckets: Option[Seq[Long]] = None)
    : Option[DataFrame] = {
    val fs = fsOf(spark, baseDir)
    val cutoff = info.map(_._1).getOrElse(-1L)
    val compactPart = info
      .filter { case (c, n) =>
        compactHasData(fs, s"$baseDir/compact=$c.n$n") }
      .map { case (c, n) =>
        val df = spark.read.parquet(s"$baseDir/compact=$c.n$n")
        pbuckets.fold(df)(bs => df.filter(col("pbucket").isin(bs: _*)))
          .drop("pbucket")
      }
    val recentDirs = committedDataDirs(fs, baseDir, cutoff, excludeBatch)
    val recentPart =
      if (recentDirs.isEmpty) None
      else Some(spark.read.option("basePath", baseDir)
        .parquet(recentDirs: _*)
        .withColumn("batch", col("batch").cast("long")))
    (compactPart, recentPart) match {
      case (Some(c), Some(r)) => Some(c.unionByName(r))
      case (c, r) => c.orElse(r)
    }
  }

  /** Fold every committed batch ≤ `upTo` (plus the previous compact
    * content) into `compact=<cutoff>.n<buckets>`, partitioned by
    * [[bucketOf]] `bucketKey`, then sweep the folded dirs. Idempotent
    * and crash-safe (commit protocol in the class doc); re-running
    * after any crash converges. Returns the effective cutoff (−1 when
    * there is nothing to compact). NOT concurrency-safe against
    * itself — call it from the single writer (the maintainers trigger
    * it inside `processBatch`, which Structured Streaming serializes
    * per query).
    *
    * `minFoldRatio` is the write-amplification governor: a fold
    * REWRITES the whole compacted table, so folding on a fixed batch
    * cadence alone would cost O(index) per fold — quadratic total
    * writes over the stream's life. With the ratio set (the
    * maintainers pass 0.1), a fold only proceeds once the recent
    * batch dirs' bytes reach that fraction of the compact dir's —
    * the LSM discipline: every byte is rewritten O(log n / log(1+r))
    * times total, while the recent tail stays bounded at r·index
    * (reads stay O(compacted + bounded tail)). The FIRST fold (no
    * compact dir yet) always proceeds. */
  def compact(spark: SparkSession, baseDir: String, upTo: Long,
    bucketKey: String, nBuckets: Int = 64,
    minFoldRatio: Double = 0.0): Long = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val fs = fsOf(spark, baseDir)
    val prev = compactInfo(spark, baseDir)
    val prevCutoff = prev.map(_._1).getOrElse(-1L)
    val foldIds = committedIds(spark, baseDir)
      .filter(id => id > prevCutoff && id <= upTo)
    val cutoff = if (foldIds.isEmpty) prevCutoff
      else math.max(prevCutoff, foldIds.max)
    if (cutoff < 0) return -1L // nothing committed yet, nothing to do
    if (cutoff > prevCutoff && minFoldRatio > 0.0 && prev.isDefined &&
      foldIds.size < MaxTailDirs) { // past the dir budget, always fold
      val compactBytes = prev.map { case (c, n) =>
        fs.getContentSummary(new Path(s"$baseDir/compact=$c.n$n"))
          .getLength }.getOrElse(0L)
      val recentBytes = committedDataDirs(fs, baseDir, prevCutoff, -1L)
        .filter(_.split("batch=").last.toLong <= cutoff)
        .map(d => fs.getContentSummary(new Path(d)).getLength).sum
      if (recentBytes < compactBytes * minFoldRatio)
        return prevCutoff // defer: tail too small to pay a rewrite
    }
    val target = s"$baseDir/compact=$cutoff.n$nBuckets"
    if (cutoff > prevCutoff || !committed(spark, target)) {
      // fold: previous compact + committed data dirs in (prev, cutoff]
      val prevPart = prev
        .filter { case (c, n) =>
          compactHasData(fs, s"$baseDir/compact=$c.n$n") }
        .map { case (c, n) =>
          spark.read.parquet(s"$baseDir/compact=$c.n$n").drop("pbucket")
        }
      val dirs = committedDataDirs(fs, baseDir, prevCutoff, -1L)
        .filter(_.split("batch=").last.toLong <= cutoff)
      val dataPart =
        if (dirs.isEmpty) None
        else Some(spark.read.option("basePath", baseDir)
          .parquet(dirs: _*)
          .withColumn("batch", col("batch").cast("long")))
      val folded = (prevPart, dataPart) match {
        case (Some(p), Some(d)) => Some(p.unionByName(d))
        case (p, d) => p.orElse(d)
      }
      folded match {
        case Some(df) =>
          df.withColumn("pbucket", bucketOf(col(bucketKey), nBuckets))
            .write.mode("overwrite").partitionBy("pbucket")
            .parquet(target)
        case None =>
          // only empty batches in range: commit an empty compact dir
          // (marker only) so the coverage rule advances past them
          fs.mkdirs(new Path(target))
          fs.create(new Path(target, "_SUCCESS"), true).close()
      }
    }
    // TWO-PHASE sweep: delete only what the PREVIOUS generation
    // already made redundant (batch dirs ≤ prevCutoff, compact dirs
    // at or below prevCutoff other than the generation resolved at
    // entry). Dirs folded into THIS generation survive one more
    // compaction as a grace window for concurrent readers — a reader
    // that listed directories before this commit can still open every
    // file it saw, and a pruned reader pinned to the previous
    // generation ([[readCommittedAt]]) still finds its compact dir —
    // INCLUDING a same-cutoff predecessor superseded by an explicit
    // bucket-count change (deleting it in the same call would yank
    // the modulus out from under a pinned pruned reader;
    // [[compactInfo]]'s mtime pick keeps the two-generations state
    // unambiguous). Readers never DUPLICATE retained dirs (the
    // strictly-above-cutoff rule excludes batch grace dirs; only the
    // resolved compact generation is ever read), so the grace debris
    // costs one cadence of extra listing, bounded. A crash mid-sweep
    // just leaves debris for the next call.
    val keepCompact = Set(s"compact=$cutoff.n$nBuckets") ++
      prev.map { case (c, n) => s"compact=$c.n$n" }
    val base = new Path(baseDir)
    fs.listStatus(base).foreach { s =>
      s.getPath.getName match {
        case BatchName(id) if id.toLong <= prevCutoff =>
          // only committed dirs: a torn batch dir (no marker) at or
          // below the cutoff is out-of-contract debris, but deleting
          // a dir a concurrent writer is mid-writing would corrupt
          // its commit — leave it
          if (fs.exists(new Path(s.getPath, "_SUCCESS")))
            fs.delete(s.getPath, true)
        case CompactName(c, _) if c.toLong <= prevCutoff &&
          !keepCompact(s.getPath.getName) =>
          fs.delete(s.getPath, true)
        case _ => ()
      }
    }
    cutoff
  }
}
