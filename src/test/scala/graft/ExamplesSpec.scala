package graft

import java.nio.file.{Files, Paths}

/** Drives the MIGRATION.md example entry points end-to-end on the
  * test fixtures. */
class ExamplesSpec extends SparkTestBase {

  test("geojsonEtl writes one .ttl per input stem") {
    val out = Files.createTempDirectory("ex_geo").toString
    Examples.geojsonEtl(spark, "src/test/resources/fixtures", out, "T")
    assert(Files.exists(
      Paths.get(out, "TCGA-AA-1111-01Z-00-DX1.abcd-uuid-1234.ttl")))
  }

  test("mongoEtl end-to-end: batches written, ledger advances") {
    val work = Files.createTempDirectory("ex_mongo")
    val fx = "src/test/resources/fixtures/mongo"
    // empty svs glob dir: hash lookup empty → fallback hashing
    val svs = Files.createTempDirectory("ex_svs")
    Files.write(svs.resolve("dummy.svs"), "img".getBytes)
    Examples.mongoEtl(spark, s"$fx/marks.jsonl", s"$fx/analyses.jsonl",
      svs.toString + "/*.svs", s"$work/out", s"$work/ledger")
    assert(Files.exists(Paths.get(s"$work/out",
      "exec-1/img-1/batch_000001.ttl.gz")))
    // second run: analysis an-001 is in the ledger → nothing pending
    Examples.mongoEtl(spark, s"$fx/marks.jsonl", s"$fx/analyses.jsonl",
      svs.toString + "/*.svs", s"$work/out2", s"$work/ledger")
    assert(!Files.exists(Paths.get(s"$work/out2")) ||
      Files.list(Paths.get(s"$work/out2")).count() == 0)
  }
}
