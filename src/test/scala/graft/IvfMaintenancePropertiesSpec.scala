package graft

import graft.operators.{IvfIndex, SyntheticEmbeddings}
import graft.streaming.{BatchDirs, IvfIndexMaintenance}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Randomized interleaving property test for the IVF maintainer —
  * the vector-side twin of LshMaintenancePropertiesSpec: random batch
  * splits of a clustered corpus, processed with random replays and
  * out-of-band folds (random bucket counts, mid-stream re-bucketing),
  * must always leave an index row-identical to `IvfIndex.build` on
  * the full corpus, and searches over it identical to the batch
  * index. The IVF path differs from LSH where it counts: appends
  * never read the index (no face 2), postings carry embeddings, and
  * the assignment must stay deterministic across every replay
  * ordering. */
class IvfMaintenancePropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = SyntheticEmbeddings
    .clustered(spark, n = 48, dims = 8, centers = 4, sep = 6.0)
    .select("vec_id", "embedding")

  private sealed trait Step
  private case object Next extends Step
  private case object Replay extends Step
  private case class Fold(nBuckets: Int) extends Step

  private val caseGen: Gen[(Int, List[Step])] = for {
    nBatches <- Gen.choose(2, 4)
    steps <- Gen.listOfN(9, Gen.frequency(
      4 -> Gen.const(Next),
      2 -> Gen.const(Replay),
      3 -> Gen.oneOf(4, 8).map(Fold(_))))
  } yield (nBatches, steps)

  test("random interleavings of appends, replays, and out-of-band " +
    "folds always equal the batch build") {
    val centroids = IvfIndex.buildCentroids(
      corpus.filter(col("vec_id") < 16), k = 4, iters = 2)
    val batchOp = IvfIndex.build(corpus, centroids)
      .select("cluster_id", "vec_id").as[(Int, Long)].collect().toSet
    val probes = corpus.filter(col("vec_id").isin(1L, 20L, 40L))
    val viaBatch = IvfIndex.search(IvfIndex.build(corpus, centroids),
        centroids, probes, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    seededForAll(caseGen, 6, 7373L) { case (nBatches, steps) =>
      val dir = java.nio.file.Files
        .createTempDirectory("ivf_prop").toString + "/index"
      var done = -1
      def process(id: Int): Unit =
        IvfIndexMaintenance.processBatch(
          corpus.filter(pmod(col("vec_id"), lit(nBatches)) === id),
          id.toLong, centroids, dir, compactEvery = 0, nBuckets = 8)
      steps.foreach {
        case Next if done + 1 < nBatches => done += 1; process(done)
        case Replay if done >= 0 => process(done) // must be a no-op
        case Fold(n) if done >= 1 =>
          IvfIndexMaintenance.compactNow(spark, dir,
            (done - 1).toLong, n)
        case _ => ()
      }
      while (done + 1 < nBatches) { done += 1; process(done) }
      val streamed = IvfIndexMaintenance.index(spark, dir).get
        .select("cluster_id", "vec_id").as[(Int, Long)]
        .collect().toSet
      assert(streamed == batchOp,
        s"interleaving diverged (steps=$steps nBatches=$nBatches):\n" +
          s"missing=${batchOp -- streamed}\n" +
          s"extra=${streamed -- batchOp}")
      val viaStream = IvfIndexMaintenance
        .search(spark, dir, centroids, probes, nProbe = 2, topK = 3)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(viaStream == viaBatch, "search diverged after interleaving")
      // pruned search agrees whenever a fold actually landed
      if (BatchDirs.compactedThrough(spark, dir) >= 0) {
        val viaPruned = IvfIndexMaintenance
          .searchPruned(spark, dir, centroids, probes,
            nProbe = 2, topK = 3)
          .as[(Long, Long, Long, Long)].collect().toSeq
        graft.operators.Broadcasting.releaseAll()
        assert(viaPruned == viaBatch,
          "pruned search diverged after interleaving")
      }
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
    }
  }
}
