package graft

import graft.pipelines.{MongoMarksPipeline, TtlFileSink}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

/** Golden test vs. the reference's mongodb_to_rdf batch output
  * (BATCH_SIZE=2 emulation; fully deterministic — no timestamp). The
  * golden run had no resolvable slide hash (slide ids must be int-able
  * for the reference's Drupal fetch), so hash_missing=true + fallback
  * sha256(imageid) — the engine reproduces that with an empty lookup. */
class MongoMarksPipelineSpec extends SparkTestBase {
  private val fx = "src/test/resources/fixtures/mongo"
  private def golden(b: Int): String =
    new String(Files.readAllBytes(Paths.get(
      f"src/test/resources/golden/mongo_batch_$b%06d.ttl")), "UTF-8")

  private def emptyHashes = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("slide", "real_hash")
  }

  private lazy val docs = MongoMarksPipeline.documents(
    MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl"),
    MongoMarksPipeline.readAnalyses(spark, s"$fx/analyses.jsonl"),
    emptyHashes, batchSize = 2).collect()
    .map(r => r.getAs[String]("rel_path") ->
      (r.getAs[String]("ttl"), r.getAs[Long]("n_marks"))).toMap

  test("batch documents match reference output byte-for-byte") {
    assert(docs.keySet == Set(
      "exec-1/img-1/batch_000001.ttl.gz", "exec-1/img-1/batch_000002.ttl.gz"))
    for (b <- 1 to 2) {
      val (ttl, _) = docs(f"exec-1/img-1/batch_$b%06d.ttl.gz")
      assert(ttl == golden(b), {
        val a = ttl.linesIterator.toSeq
        val g = golden(b).linesIterator.toSeq
        s"batch $b first diff: ${
          a.zipAll(g, "<EOF>", "<EOF>").find(p => p._1 != p._2)}"
      })
    }
  }

  test("batch sizes: 2 + 1 (invalid Point mark dropped)") {
    assert(docs("exec-1/img-1/batch_000001.ttl.gz")._2 == 2L)
    assert(docs("exec-1/img-1/batch_000002.ttl.gz")._2 == 1L)
  }

  test("slide-hash enrichment: resolved hash clears hashMissing") {
    import spark.implicits._
    val hashes = Seq(("slide-42", "a" * 64)).toDF("slide", "real_hash")
    val enriched = MongoMarksPipeline.documents(
      MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl"),
      MongoMarksPipeline.readAnalyses(spark, s"$fx/analyses.jsonl"),
      hashes, batchSize = 2).collect()
    val ttl = enriched.head.getAs[String]("ttl")
    assert(ttl.contains("<urn:sha256:" + "a" * 64 + ">"))
    assert(!ttl.contains("hal:hashMissing"))
  }

  test("TtlFileSink writes gzip files, atomic, skip-if-exists") {
    val tmp = Files.createTempDirectory("ttlsink").toString
    val df = MongoMarksPipeline.documents(
      MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl"),
      MongoMarksPipeline.readAnalyses(spark, s"$fx/analyses.jsonl"),
      emptyHashes, batchSize = 2)
    TtlFileSink.write(df, tmp)
    val p = Paths.get(tmp, "exec-1/img-1/batch_000001.ttl.gz")
    assert(Files.exists(p))
    val content = new String(
      new GZIPInputStream(Files.newInputStream(p)).readAllBytes(), "UTF-8")
    assert(content == golden(1))
    // skip-if-exists: overwrite the file, re-run with skipExisting
    Files.writeString(Paths.get(tmp, "exec-1/img-1/batch_000002.ttl.gz"),
      "sentinel")
    TtlFileSink.write(df, tmp, skipExisting = true)
    assert(Files.readString(
      Paths.get(tmp, "exec-1/img-1/batch_000002.ttl.gz")) == "sentinel")
  }

  test("TtlFileSink's Hadoop path works end-to-end (driven via file:/)") {
    // writeHadoop is the HDFS/S3A code path; drive it through a file:
    // URI so its FileSystem/FileContext mechanics are exercised (the
    // public write() routes local schemes to the java.nio fast path).
    val tmp = Files.createTempDirectory("ttlsink_uri")
    val df = MongoMarksPipeline.documents(
      MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl"),
      MongoMarksPipeline.readAnalyses(spark, s"$fx/analyses.jsonl"),
      emptyHashes, batchSize = 2)
    TtlFileSink.writeHadoop(df.select("rel_path", "ttl"),
      tmp.toUri.toString, skipExisting = false)
    val p = Paths.get(tmp.toString, "exec-1/img-1/batch_000001.ttl.gz")
    assert(Files.exists(p))
    val content = new String(
      new GZIPInputStream(Files.newInputStream(p)).readAllBytes(), "UTF-8")
    assert(content == golden(1))
    // no stray temp files left behind
    val strays = Files.walk(tmp).toArray.map(_.toString)
      .filter(_.contains(".tmp-"))
    assert(strays.isEmpty, strays.mkString(","))
  }

  test("TtlFileSink never URI-parses rel_path (':' and '#' in segments)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("ttlsink_colon").toString
    // exec ids are arbitrary store strings — "run:2020" must not be
    // read as a URI scheme, nor '#' as a fragment
    val df = Seq(
      ("run:2020-01/img#7/batch_000001.ttl", "content-a"),
      ("plain/batch_000002.ttl", "content-b"))
      .toDF("rel_path", "ttl")
    TtlFileSink.write(df, tmp)
    assert(Files.readString(
      Paths.get(tmp, "run:2020-01/img#7/batch_000001.ttl")) == "content-a")
    assert(Files.readString(
      Paths.get(tmp, "plain/batch_000002.ttl")) == "content-b")
  }

  test("a degenerate point ([], [x]) skips THAT mark silently " +
    "(reference behavior) instead of ANSI-crashing the job") {
    import spark.implicits._
    def mark(id: String, coords: String) =
      s"""{"_id":"$id","provenance":{"analysis":{"execution_id":"e1"},""" +
        s""""image":{"imageid":"i1","slide":""}},""" +
        s""""geometries":{"features":[{"geometry":{"type":"Polygon",""" +
        s""""coordinates":$coords},"properties":{"footprint":1.0,""" +
        s""""nucleustype":"a.b.c"}}]}}"""
    val marks = spark.read.schema(MongoMarksPipeline.markSchema)
      .json(Seq(
        mark("m-good", "[[[0.1,0.2],[0.3,0.2],[0.3,0.4]]]"),
        mark("m-empty-pt", "[[[0.1,0.2],[],[0.3,0.4]]]"),
        mark("m-one-coord", "[[[0.1,0.2],[0.5],[0.3,0.4]]]")).toDS)
    val analyses = spark.read
      .schema(MongoMarksPipeline.analysisSchema)
      .json(Seq("""{"_id":"a1","analysis":{"execution_id":"e1"},""" +
        """"image":{"imageid":"i1"}}""").toDS)
    val got = MongoMarksPipeline.markSide(marks,
      MongoMarksPipeline.analysisSide(analyses, emptyHashes))
      .select("mark_id").as[String].collect().toSet
    assert(got == Set("m-good"), got)
  }

  test("two analysis docs sharing (exec, image) never collide on " +
    "rel_path — highest analysis_id wins (reference last-wins proxy)") {
    import spark.implicits._
    val marks = MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl")
    // duplicate every fixture analysis under a LOWER id ("00-" sorts
    // before any hex ObjectId) — max-wins must keep the original
    val base = spark.read.text(s"$fx/analyses.jsonl").as[String]
      .collect()
    val dup = base.flatMap { line =>
      Seq(line.replaceFirst("\"_id\"\\s*:\\s*\"", "\"_id\":\"00-"),
        line)
    }
    val analyses = spark.read
      .schema(MongoMarksPipeline.analysisSchema).json(dup.toSeq.toDS)
    val out = MongoMarksPipeline.documents(marks, analyses,
      emptyHashes, batchSize = 2).collect()
    val paths = out.map(_.getAs[String]("rel_path"))
    assert(paths.distinct.length == paths.length,
      s"colliding rel_paths: ${paths.mkString(", ")}")
    // the kept analysis is the HIGHEST id — "00-…" never appears
    assert(out.forall(!_.getAs[String]("ttl").contains("00-")),
      "00 won")
    // and the output equals the single-analysis golden run exactly
    assert(out.map(r => r.getAs[String]("rel_path") ->
      r.getAs[String]("ttl")).toMap ==
      docs.map { case (p, (t, _)) => p -> t })
  }

  test("skewSafe distributed rank: byte-identical output to the " +
    "naive window, multi-bucket, on a Zipf-skewed corpus") {
    // force real multi-bucket operation: every id sampled, 7 cut
    // points, so the hot analysis genuinely splits across buckets
    spark.conf.set("spark.graft.etl.skewSampleFraction", "1.0")
    spark.conf.set("spark.graft.etl.skewBuckets", "8")
    try {
      val marks = EtlBench.synthMarks(spark, 3000, 4, Some("zipf"))
      val analyses = EtlBench.synthAnalyses(spark, 4)
      def run(skewSafe: Boolean) = MongoMarksPipeline
        .documents(marks, analyses, emptyHashes, batchSize = 100,
          skewSafe = skewSafe)
        .collect()
        .map(r => r.getAs[String]("rel_path") ->
          ((r.getAs[String]("ttl"), r.getAs[Long]("n_marks")))).toMap
      val naive = run(skewSafe = false)
      val safe = run(skewSafe = true)
      // hot analysis really is hot (harmonic-Zipf rank 0 ≈ 43% at
      // N=4) and really does span several batches
      val hotFiles = naive.keys.count(_.startsWith("exec-0/"))
      assert(hotFiles >= 10, s"expected a hot analysis, got $hotFiles files")
      assert(safe == naive,
        s"skewSafe output diverged; first diff: ${
          (naive.keySet ++ safe.keySet).toSeq.sorted
            .find(k => naive.get(k) != safe.get(k))
            .map(k => s"$k naive=${naive.get(k).map(_._2)} " +
              s"safe=${safe.get(k).map(_._2)}")}")
    } finally {
      spark.conf.unset("spark.graft.etl.skewSampleFraction")
      spark.conf.unset("spark.graft.etl.skewBuckets")
    }
  }

  test("skewSafe path reproduces the reference golden byte-for-byte") {
    val out = MongoMarksPipeline.documents(
      MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl"),
      MongoMarksPipeline.readAnalyses(spark, s"$fx/analyses.jsonl"),
      emptyHashes, batchSize = 2, skewSafe = true).collect()
      .map(r => r.getAs[String]("rel_path") -> r.getAs[String]("ttl"))
      .toMap
    assert(out == docs.map { case (p, (t, _)) => p -> t })
  }
}
