package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.ttl.{Rdf, Turtle}
import graft.ttl.Turtle.Triple
import org.apache.spark.sql.functions._

class RdfDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val Fmt = "graft.sources.RdfDataSource"

  private def writeFile(dir: String, name: String, body: String): Unit = {
    if (name.endsWith(".gz")) {
      val out = new GZIPOutputStream(
        Files.newOutputStream(Paths.get(dir, name)))
      out.write(body.getBytes("UTF-8")); out.close()
    } else Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))
  }

  private val g1 = Seq(
    Triple("<http://x/a>", "<http://x/p>", "\"v1\""),
    Triple("<http://x/a>", "<http://x/q>", "<http://x/b>"),
    Triple("_:b0", "<http://x/p>", "\"anon\""))
  private val g2 = Seq(
    Triple("<http://x/c>", "<http://x/p>", "\"v2\""),
    Triple("_:b0", "<http://x/p>", "\"other-doc-anon\""))

  private def freshDir(): String =
    Files.createTempDirectory("rdf_dsv2").toString

  test("reads a directory of ttl (+gz) files, one partition per doc") {
    val dir = freshDir()
    writeFile(dir, "g1.ttl", Rdf.serialize(g1, "nt"))
    writeFile(dir, "g2.ttl.gz", Rdf.serialize(g2, "nt"))
    val df = spark.read.format(Fmt).load(dir)
    assert(df.rdd.getNumPartitions == 2) // one per document
    val got = df.select("s", "p", "o").as[(String, String, String)]
      .collect().toSet
    // non-bnode triples survive verbatim
    assert(got.contains(("<http://x/a>", "<http://x/p>", "\"v1\"")))
    assert(got.contains(("<http://x/c>", "<http://x/p>", "\"v2\"")))
    assert(got.size == 5)
    // per-document bnode scoping: the two _:b0 stay distinct
    val bnodes = got.collect { case (s, _, _) if s.startsWith("_:") => s }
    assert(bnodes.size == 2)
  }

  test("directory listing is RECURSIVE: nested subject dirs are " +
    "scanned, not silently dropped") {
    val dir = freshDir()
    writeFile(dir, "top.ttl", Rdf.serialize(g1, "nt"))
    Files.createDirectories(Paths.get(dir, "subjectA", "deep"))
    writeFile(s"$dir/subjectA", "mid.ttl", Rdf.serialize(g2, "nt"))
    writeFile(s"$dir/subjectA/deep", "leaf.ttl",
      Rdf.serialize(Seq(Triple("<http://x/d>", "<http://x/p>",
        "\"v3\"")), "nt"))
    val df = spark.read.format(Fmt).load(dir)
    assert(df.rdd.getNumPartitions == 3,
      "nested files missing from the scan")
    val got = df.select("o").as[String].collect().toSet
    assert(Set("\"v1\"", "\"v2\"", "\"v3\"").subsetOf(got), s"$got")
  }

  test("agrees with the Dataset-API loader (same parse, same tags)") {
    val dir = freshDir()
    writeFile(dir, "g1.ttl", Rdf.serialize(g1, "turtle"))
    writeFile(dir, "g2.ttl", Rdf.serialize(g2, "turtle"))
    val viaDsv2 = spark.read.format(Fmt).load(dir)
      .select("s", "p", "o").as[(String, String, String)].collect()
      .toSet
    val viaLoader = Rdf.load(spark, dir, "turtle")
      .collect().map(t => (t.s, t.p, t.o)).toSet
    assert(viaDsv2 == viaLoader)
  }

  test("column pruning reaches the scan (ReadSchema)") {
    val dir = freshDir()
    writeFile(dir, "g1.ttl", Rdf.serialize(g1, "nt"))
    val df = spark.read.format(Fmt).load(dir).select("s")
    // the v2 BatchScan prints its (pruned) output attribute list
    val plan = df.queryExecution.executedPlan.toString
    assert("BatchScan [^\\[]*\\[s#\\d+\\] graft-rdf".r
      .findFirstIn(plan).isDefined, plan)
    assert(df.as[String].collect().length == 3)
  }

  test("explicit rdfFormat option overrides extensions; xml parses") {
    val dir = freshDir()
    writeFile(dir, "g.rdf", Rdf.serialize(g1.filterNot(
      _.s.startsWith("_:")), "xml"))
    val got = spark.read.format(Fmt).load(dir)
      .select("s").distinct().as[String].collect().toSet
    assert(got == Set("<http://x/a>"))
  }

  test("src_file column names the document") {
    val dir = freshDir()
    writeFile(dir, "g1.ttl", Rdf.serialize(g1, "nt"))
    val files = spark.read.format(Fmt).load(dir)
      .select("src_file").distinct().as[String].collect()
    assert(files.length == 1 && files.head.endsWith("g1.ttl"))
  }

  test("src_file filters prune whole documents at planning time") {
    val dir = freshDir()
    writeFile(dir, "g1.ttl", Rdf.serialize(g1, "nt"))
    writeFile(dir, "g2.ttl", Rdf.serialize(g2, "nt"))
    val filtered = spark.read.format(Fmt).load(dir)
      .filter(col("src_file").endsWith("g1.ttl"))
    // pruning is visible as partition count: only g1 is planned
    assert(filtered.rdd.getNumPartitions == 1)
    assert(filtered.count() == 3)
    // predicates NOT decidable from the name stay post-scan, sound
    val onS = spark.read.format(Fmt).load(dir)
      .filter(col("s") === "<http://x/c>")
    assert(onS.rdd.getNumPartitions == 2) // no bogus pruning
    assert(onS.count() == 1)
    // a predicate rejecting every file yields an empty frame, not an
    // error
    assert(spark.read.format(Fmt).load(dir)
      .filter(col("src_file").endsWith("nope.ttl")).count() == 0)
  }

  test("unknown extensions and empty dirs fail loudly") {
    val dir = freshDir()
    writeFile(dir, "g1.txt", "not rdf")
    intercept[Exception](
      spark.read.format(Fmt).load(dir).collect())
  }
}
