package graft

import graft.operators.MinHashLsh
import graft.streaming.{BatchDirs, LshIndexMaintenance}

/** REAL-THREAD exercise of the single-compactor contract: an
  * out-of-band maintenance loop (`compactNow`, `failIfBusy` — fails
  * loudly on contention) races a cadence-enabled `processBatch`
  * stream (whose in-band folds defer silently on contention). The
  * required outcome is serialize-or-fail-loudly, never corrupt: the
  * final candidate-pair set must equal the batch operator on the
  * full corpus, bit for bit.
  *
  * Why this is deterministic rather than timing-lucky: the
  * maintenance loop only attempts a fold after the newest committed
  * batch ADVANCES past its last fold target, and the stream commits
  * a new batch only after its face-2 read completed — so at most ONE
  * fold (and no debris-sweeping no-op call: attempts are gated on
  * new foldable batches) can land inside any single in-flight pinned
  * read, which is exactly the one-call grace window the two-phase
  * sweep guarantees. Lease collisions (in-band cadence vs the loop)
  * resolve as defer (in-band) or a caught IllegalStateException
  * (loop retries) — both leave the directory state untouched. */
class CompactionConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  test("compactNow racing a cadence-enabled processBatch stream: " +
    "folds serialize or fail loudly, and the final pair set is exact") {
    val base = java.nio.file.Files
      .createTempDirectory("cc_race").toString
    val (ix, pr) = (s"$base/index", s"$base/pairs")
    // 12 batches over three near-dup families so pairs form within
    // and across batches (and across fold boundaries)
    val docs = (0 until 12).map { i =>
      val fam = i % 3
      (i.toLong, s"family $fam shares almost all of its words with " +
        s"its siblings variant token$i")
    }
    val batches = docs.grouped(1).toSeq // one doc per micro-batch

    @volatile var streamDone = false
    @volatile var loopFailure: Option[Throwable] = None
    var leaseBusy = 0
    var folds = 0
    val maintenance = new Thread(() => {
      try {
        var lastFolded = -1L
        while (!streamDone || {
          // one final attempt after the stream stops
          val (_, ids) = BatchDirs.committedState(spark, ix)
          ids.maxOption.exists(_ - 1 > lastFolded)
        }) {
          val (_, ids) = BatchDirs.committedState(spark, ix)
          val newest = ids.maxOption.getOrElse(-1L)
          if (newest - 1 > lastFolded) {
            try {
              val c = LshIndexMaintenance.compactNow(spark, ix, pr,
                newest - 1, nBuckets = 8)
              if (c >= 0) { folds += 1; lastFolded = math.max(lastFolded, c) }
              else lastFolded = math.max(lastFolded, newest - 1)
            } catch {
              // the in-band cadence held the lease: fail-loudly is
              // the contract — the loop retries next round
              case _: IllegalStateException => leaseBusy += 1
            }
          }
          Thread.sleep(5)
        }
      } catch { case t: Throwable => loopFailure = Some(t) }
    }, "oob-compactor")
    maintenance.start()
    try {
      batches.zipWithIndex.foreach { case (b, id) =>
        LshIndexMaintenance.processBatch(b.toDF("doc_id", "text"),
          id.toLong, "doc_id", "text", ix, pr, compactEvery = 4,
          nBuckets = 8)
      }
    } finally {
      streamDone = true
      maintenance.join(60000)
    }
    assert(!maintenance.isAlive, "maintenance loop wedged")
    assert(loopFailure.isEmpty,
      s"maintenance loop crashed: ${loopFailure.map(_.toString)}")
    // correctness is the whole point: exact equality with the batch
    // operator over the final corpus, whatever interleaving happened
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val batchRef = MinHashLsh
      .candidatePairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(batchRef.nonEmpty, "fixture produced no candidate pairs")
    assert(streamed == batchRef,
      s"interleaved folds corrupted the view:\n" +
        s"stream=$streamed\nbatch=$batchRef\n" +
        s"(folds=$folds leaseBusy=$leaseBusy)")
    // the index is fold-covered and the layout converged to the
    // bounded shape: tiers + at most a cadence of batch dirs
    assert(BatchDirs.compactedThrough(spark, ix) >= 0L,
      s"no fold ever landed (folds=$folds) — the race never happened")
  }

  test("concurrent pairsSoFar readers racing cadence folds: every " +
    "read is bracketed by the committed prefixes (never silently " +
    "short, never inventing), or fails loudly on an exhausted grace") {
    val base = java.nio.file.Files
      .createTempDirectory("cc_readers").toString
    val (ix, pr) = (s"$base/index", s"$base/pairs")
    val docs = (0 until 12).map { i =>
      val fam = i % 3
      (i.toLong, s"family $fam shares almost all of its words with " +
        s"its siblings variant token$i")
    }
    // the oracle: candidate pairs over each PREFIX of the stream —
    // by the completeness contract, the union of per-batch outputs
    // over the first m committed batches equals the batch operator
    // on the first m docs, so a read that starts after m batches
    // completed must contain expect(m), and one that ends before m'
    // completed must stay inside expect(m')
    val expect: IndexedSeq[Set[(Long, Long, Long)]] =
      (0 to docs.size).map { m =>
        if (m == 0) Set.empty[(Long, Long, Long)]
        else MinHashLsh
          .candidatePairs(docs.take(m).toDF("doc_id", "text"),
            "doc_id", "text")
          .as[(Long, Long, Long)].collect().toSet
      }
    assert(expect.last.nonEmpty, "fixture produced no pairs")
    @volatile var completed = 0
    @volatile var streamDone = false
    val violations =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var reads, loudReads = 0
    def isFnf(t: Throwable): Boolean = {
      var c: Throwable = t
      while (c != null) {
        if (c.isInstanceOf[java.io.FileNotFoundException] ||
          Option(c.getMessage).exists(_.contains("FileNotFound")))
          return true
        c = if (c.getCause == c) null else c.getCause
      }
      false
    }
    val reader = new Thread(() => {
      while (!streamDone) {
        val m0 = completed
        try {
          val got = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
            .as[(Long, Long, Long)].collect().toSet
          // upper bracket is m1 + 1: the batch IN FLIGHT when the
          // collect ends commits its output before the driver loop
          // bumps `completed`, so its pairs may legitimately be
          // visible one step early — anything beyond that one batch
          // would be invented
          val m1 = math.min(completed + 1, docs.size)
          reads += 1
          if (!expect(m0).subsetOf(got))
            violations.add(s"read after $m0 batches MISSING " +
              s"${expect(m0) -- got}")
          if (!got.subsetOf(expect(m1)))
            violations.add(s"read inside $m1 batches INVENTED " +
              s"${got -- expect(m1)}")
        } catch {
          // a lazy read overlapping two compactor calls exhausts its
          // grace window: loud (FNF / the exactness guard), never a
          // wrong answer — tolerated, counted
          case e: Exception
            if isFnf(e) || (e.isInstanceOf[IllegalStateException] &&
              Option(e.getMessage).exists(_.contains("grace window"))) =>
            loudReads += 1
          case t: Throwable =>
            violations.add(s"reader crashed unexpectedly: $t")
        }
        Thread.sleep(2)
      }
    }, "pairs-reader")
    reader.start()
    try {
      docs.zipWithIndex.foreach { case (d, id) =>
        LshIndexMaintenance.processBatch(Seq(d).toDF("doc_id", "text"),
          id.toLong, "doc_id", "text", ix, pr, compactEvery = 3,
          nBuckets = 8)
        completed = id + 1
      }
    } finally {
      streamDone = true
      reader.join(60000)
    }
    assert(!reader.isAlive, "reader thread wedged")
    assert(violations.isEmpty, s"read-visibility violations:\n  " +
      violations.toArray.mkString("\n  ") +
      s"\n(reads=$reads loud=$loudReads)")
    assert(reads >= 3, s"only $reads successful reads — the race " +
      "never exercised the reader path")
    // and the settled view is the full batch answer
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == expect.last)
    graft.operators.Broadcasting.releaseAll()
  }
}
