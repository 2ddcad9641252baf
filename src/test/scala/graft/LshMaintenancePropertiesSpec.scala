package graft

import graft.operators.MinHashLsh
import graft.streaming.{BatchDirs, LshIndexMaintenance}
import org.apache.hadoop.fs.Path
import org.scalacheck.Gen

/** Randomized end-to-end property test for the LSH maintainer: a
  * random corpus with planted near-dup families, split into random
  * batches, processed with RANDOM interleavings of out-of-band folds
  * (compactNow at random upTo, random bucket counts — including
  * mid-stream re-bucketing) and replays of already-committed batches
  * — the final candidate-pair view must equal the batch operator on
  * the full corpus on EVERY path. This is the combinatorial closure
  * over the individually-spec'd cases (cadence folds, replays,
  * restarts, grace windows): no interleaving of the legal operations
  * may lose a pair, duplicate a pair, or change an n_shared_bands
  * count. */
class LshMaintenancePropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val pool = Vector("spark", "plans", "shuffle", "exchange",
    "broadcast", "join", "scale", "stream", "batch", "index", "band",
    "bucket", "fold", "grace", "marker", "replay", "commit", "sweep")

  // a family = one base sentence + near-dup mutations (change the
  // last word); families of size >= 2 plant guaranteed candidates
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nFam <- Gen.choose(2, 4)
    fams <- Gen.listOfN(nFam, for {
      words <- Gen.listOfN(10, Gen.oneOf(pool))
      size <- Gen.choose(1, 3)
    } yield (0 until size).map(i =>
      (words.dropRight(1) :+ s"v$i").mkString(" ")))
    singles <- Gen.choose(1, 3)
    extra <- Gen.listOfN(singles,
      Gen.listOfN(10, Gen.oneOf(pool)).map(_.mkString(" ")))
  } yield (fams.flatten ++ extra).zipWithIndex
    .map { case (t, i) => (i.toLong, t) }

  private sealed trait Step
  private case object Next extends Step   // process the next batch
  private case object Replay extends Step // replay the newest batch
  private case class Fold(nBuckets: Int) extends Step // out-of-band

  private val caseGen: Gen[(List[(Long, String)], Int, List[Step])] =
    for {
      corpus <- corpusGen
      nBatches <- Gen.choose(2, 4)
      steps <- Gen.listOfN(10, Gen.frequency(
        4 -> Gen.const(Next),
        2 -> Gen.const(Replay),
        3 -> Gen.oneOf(4, 8).map(Fold(_))))
    } yield (corpus, nBatches, steps)

  test("random interleavings of batches, replays, and out-of-band " +
    "folds always equal the batch operator") {
    seededForAll(caseGen, 6, 9090L) { case (corpus, nBatches, steps) =>
      val base = java.nio.file.Files
        .createTempDirectory("lsh_prop").toString
      val (ix, pr) = (s"$base/index", s"$base/pairs")
      val batches = corpus.groupBy(_._1 % nBatches).toSeq
        .sortBy(_._1).map(_._2)
      var done = -1 // highest processed batch id
      def process(id: Int): Unit =
        LshIndexMaintenance.processBatch(
          batches(id).toDF("doc_id", "text"), id.toLong,
          "doc_id", "text", ix, pr, compactEvery = 0, nBuckets = 8)
      steps.foreach {
        case Next if done + 1 < batches.size =>
          done += 1; process(done)
        case Replay if done >= 0 =>
          process(done) // committed -> must be a no-op
        case Fold(n) if done >= 1 =>
          // a maintenance job folds through some committed batch
          // strictly below the newest (the cadence-path rule)
          LshIndexMaintenance.compactNow(spark, ix, pr,
            (done - 1).toLong, n)
        case _ => ()
      }
      // drain any unprocessed batches so the corpus is complete
      while (done + 1 < batches.size) { done += 1; process(done) }
      val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
        .as[(Long, Long, Long)].collect().toSet
      val batchOp = MinHashLsh.candidatePairs(
          corpus.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Long)].collect().toSet
      graft.operators.Broadcasting.releaseAll()
      assert(streamed == batchOp,
        s"interleaving diverged (steps=$steps nBatches=$nBatches):\n" +
          s"missing=${batchOp -- streamed}\n" +
          s"extra=${streamed -- batchOp}")
      // the committedState snapshot stays consistent at the end too:
      // reported ids sit above the cutoff, and with no fold executed
      // every batch id is reported
      val (cut, ids) = BatchDirs.committedState(spark, ix)
      assert(ids.forall(_ > cut) && (cut >= 0 ||
        ids.sorted == (0 until batches.size).map(_.toLong)),
        s"inconsistent snapshot: cut=$cut ids=$ids")
      new Path(base).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .delete(new Path(base), true)
    }
  }
}
