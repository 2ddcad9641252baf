package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{StringType, StructType}

/** How the RDF scan's Hadoop conf reaches executors: INSIDE the
  * reader factory (the stage's task binary — broadcast once per
  * stage by Spark itself and garbage-collected by ContextCleaner),
  * not via an explicit per-scan `sparkContext.broadcast` that is
  * never destroyed and accumulates over a long-lived session. Task
  * binaries always travel through Java serialization regardless of
  * `spark.serializer`, so this spec round-trips the factory through
  * exactly that path. */
class RdfConfShippingSpec extends graft.SparkTestBase {

  test("reader factory ships the driver's session Hadoop conf in " +
    "the task binary; Java round-trip preserves session keys") {
    spark.conf.set("graft.rdf.test.marker", "mv-42")
    try {
      val dir = Files.createTempDirectory("rdf_conf").toString
      Files.write(Paths.get(dir, "d.ttl"),
        "<http://x/a> <http://x/p> \"v\" .\n".getBytes("UTF-8"))
      val scan = new RdfScan(dir + "/*",
        None, new StructType().add("s", StringType).add("o", StringType))
      val factory = scan.createReaderFactory()
        .asInstanceOf[RdfReaderFactory]
      // the exact serialization the task binary uses
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(factory); oos.close()
      val rt = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[RdfReaderFactory]
      // the driver's session key survived writeObject/readObject —
      // an executor-side `new Configuration()` would have dropped it
      assert(rt.shippedConf.get("graft.rdf.test.marker") == "mv-42")
      // and the deserialized factory opens files with the shipped conf
      val reader = rt.createReader(
        RdfFilePartition(Paths.get(dir, "d.ttl").toUri.toString, "ttl"))
      assert(reader.next())
      val row = reader.get()
      assert(row.getUTF8String(0).toString == "<http://x/a>", row)
      assert(!reader.next())
    } finally spark.conf.unset("graft.rdf.test.marker")
  }
}
