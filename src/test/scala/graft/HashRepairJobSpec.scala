package graft

import graft.pipelines.HashRepairJob
import java.nio.file.{Files, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

class HashRepairJobSpec extends SparkTestBase {

  private def gzWrite(path: java.nio.file.Path, s: String): Unit = {
    Files.createDirectories(path.getParent)
    val os = new GZIPOutputStream(Files.newOutputStream(path))
    os.write(s.getBytes("UTF-8")); os.close()
  }
  private def gzRead(path: java.nio.file.Path): String =
    new String(new GZIPInputStream(Files.newInputStream(path))
      .readAllBytes(), "UTF-8")

  test("repairs sha256 urns, upgrades md5, strips loinc, new snapshot") {
    val base = Files.createTempDirectory("ttltree")
    val out = Files.createTempDirectory("ttlout").toString
    val oldSha = "b" * 64
    val oldMd5 = "c" * 32
    gzWrite(base.resolve("slideA.svs/batch_000001.ttl.gz"),
      s"@prefix loinc: <http://loinc.org/rdf/> .\n" +
        s"<urn:sha256:$oldSha>\n    a so:ImageObject .\n")
    gzWrite(base.resolve("slideB.svs/batch_000001.ttl.gz"),
      s"<urn:md5:$oldMd5>\n    a so:ImageObject .\n")
    gzWrite(base.resolve("slideC.svs/batch_000001.ttl.gz"),
      "<urn:sha256:" + "d" * 64 + ">\n    a so:ImageObject .\n")

    val hashJson = base.resolve("slide_hashes.json")
    Files.writeString(hashJson,
      s"""[{"slide": "slideA.svs", "hash": "${"A" * 64}"},
         | {"slide": "slideB.svs", "hash": "${"e" * 64}"}]"""
        .stripMargin.replace("\n", ""))

    val repaired = HashRepairJob.run(spark, base.toString,
      hashJson.toString, out)
    assert(repaired == 2L) // slideC has no lookup entry

    val a = gzRead(Paths.get(out, "slideA.svs/batch_000001.ttl.gz"))
    assert(a.contains("<urn:sha256:" + "a" * 64 + ">"), a) // lowercased
    assert(!a.contains("loinc"))
    val b = gzRead(Paths.get(out, "slideB.svs/batch_000001.ttl.gz"))
    assert(b.contains("<urn:sha256:" + "e" * 64 + ">")) // md5 upgraded
    assert(!b.contains("urn:md5"))
    val c = gzRead(Paths.get(out, "slideC.svs/batch_000001.ttl.gz"))
    assert(c.contains("<urn:sha256:" + "d" * 64 + ">")) // untouched
  }

  test("buildHashLookup computes sha256 of file bytes (binaryFile)") {
    val dir = Files.createTempDirectory("svs")
    Files.write(dir.resolve("img1.svs"), "fake-image-bytes".getBytes)
    val lookup = HashRepairJob.buildHashLookup(spark,
      dir.toString + "/*.svs").collect()
    assert(lookup.length == 1)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("fake-image-bytes".getBytes)
      .map("%02x".format(_)).mkString
    assert(lookup.head.getString(0) == "img1")
    assert(lookup.head.getString(1) == expected)
  }
}
