package graft.sources

import java.util
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ttl.Rdf

/** DataSource V2 connector for RDF documents — the idiomatic Spark
  * seam for S10 (`U-RDF:285-300`'s multi-format graph load):
  *
  * {{{
  *   spark.read.format("graft.sources.RdfDataSource")
  *     .option("rdfFormat", "turtle")   // default: per-file extension
  *     .load("/data/graphs")            // file, dir, or glob
  * }}}
  *
  * Schema: (src_file, s, p, o) strings. One input partition per file
  * (an RDF document is the parse unit — blank-node labels are scoped
  * to it, so a file can never be split), parsed with the same
  * `Rdf.parseDocument` the Dataset-API loader uses: identical triples,
  * identical per-file bnode tags. `.gz` payloads are inflated inline.
  *
  * Column pruning is pushed down (SupportsPushDownRequiredColumns):
  * `select(s)` materializes one UTF8String per triple, not four.
  * Filters on `src_file` are pushed down too (equality, IN,
  * prefix/contains/suffix) — they prune WHOLE DOCUMENTS at planning
  * time, before any byte is read, the connector analog of partition
  * pruning. Predicates on s/p/o stay post-scan deliberately: they
  * can't skip a document without parsing it, so pushing them buys
  * nothing and hides work from Catalyst.
  *
  * At 100 TB the unit of parallelism is the file — the same layout the
  * reference's corpus has (millions of per-image documents), so the
  * scan saturates any executor count without a shuffle.
  */
class RdfDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap)
    : StructType = RdfDataSource.Schema

  override def getTable(schema: StructType,
    partitioning: Array[Transform],
    properties: util.Map[String, String]): Table =
    new RdfTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object RdfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("src_file", StringType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("o", StringType, nullable = false)))

  private[sources] val Extensions =
    Seq("ttl", "turtle", "n3", "nt", "xml", "rdf", "jsonld", "json-ld")

  /** A src_file filter as a file-name predicate, or None when the
    * filter isn't decidable from the name alone (wrong column,
    * unsupported shape). Conjunctions (And) recurse; Or/Not stay with
    * Catalyst — sound pruning only ever REMOVES files the predicate
    * provably rejects. */
  private[sources] def toFilePredicate(
    f: org.apache.spark.sql.sources.Filter)
    : Option[String => Boolean] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo("src_file", v: String) => Some(_ == v)
      case In("src_file", vs) =>
        val set = vs.collect { case s: String => s }.toSet
        if (set.size == vs.length) Some(set.contains) else None
      case StringStartsWith("src_file", p) => Some(_.startsWith(p))
      case StringEndsWith("src_file", s) => Some(_.endsWith(s))
      case StringContains("src_file", s) => Some(_.contains(s))
      case And(l, r) =>
        (toFilePredicate(l), toFilePredicate(r)) match {
          case (Some(a), Some(b)) => Some(f => a(f) && b(f))
          case _ => None
        }
      case _ => None
    }
  }

  /** Format from an explicit option or the file's extension. */
  private[sources] def formatOf(file: String, opt: Option[String])
    : String = opt.getOrElse {
    val base = if (file.endsWith(".gz")) file.dropRight(3) else file
    base.substring(base.lastIndexOf('.') + 1).toLowerCase match {
      case "rdf" => "xml"
      case e if Extensions.contains(e) => e
      case e => throw new IllegalArgumentException(
        s"$file: cannot infer RDF format from extension '.$e' — " +
          "pass option(\"rdfFormat\", ...)")
    }
  }
}

private[sources] class RdfTable(props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String =
    s"rdf(${props.getOrElse("path", "?")})"
  override def schema(): StructType = RdfDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
    : ScanBuilder = new RdfScanBuilder(props ++ options.asScala)
}

private[sources] class RdfScanBuilder(props: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = RdfDataSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve OUR field order (Spark passes its required subset)
    required = StructType(RdfDataSource.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** Accept only src_file predicates we can decide from the file NAME
    * alone; everything else stays with Catalyst (returned as
    * residual). Accepted filters also remain residual — file-name
    * evaluation is exact, but leaving them post-scan is free and
    * keeps the contract simple. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(RdfDataSource.toFilePredicate(_).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val path = props.getOrElse("path", throw new IllegalArgumentException(
      "RdfDataSource needs a path: spark.read.format(...).load(path)"))
    new RdfScan(path, props.get("rdfformat"), required,
      pushed.flatMap(RdfDataSource.toFilePredicate(_)))
  }
}

private[sources] class RdfScan(path: String, format: Option[String],
  required: StructType,
  filePredicates: Array[String => Boolean] = Array.empty)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rdf $path format=${format.getOrElse("by-extension")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val statuses = fs.globStatus(p) match {
      case null => Array.empty[org.apache.hadoop.fs.FileStatus]
      case arr => arr.flatMap { st =>
        if (st.isDirectory) {
          // RECURSIVE: a corpus organized as <dir>/<subject>/*.ttl is
          // the common layout (the reference's own output tree is
          // 4 levels deep) — a one-level listing would silently drop
          // every nested file from the scan
          val out = Array.newBuilder[org.apache.hadoop.fs.FileStatus]
          val it = fs.listFiles(st.getPath, true)
          while (it.hasNext) {
            val f = it.next()
            if (f.isFile) out += f
          }
          out.result()
        } else Array(st)
      }
    }
    val files = statuses.map(_.getPath.toString).filter { f =>
      val base = if (f.endsWith(".gz")) f.dropRight(3) else f
      RdfDataSource.Extensions.exists(e => base.endsWith("." + e))
    }.sorted
    require(files.nonEmpty,
      s"RdfDataSource: no RDF files under $path " +
        s"(extensions: ${RdfDataSource.Extensions.mkString(", ")})")
    // file-level pruning: drop whole documents the pushed src_file
    // predicates reject — an empty result is legitimate here (unlike
    // an empty listing above)
    val kept = files.filter(f => filePredicates.forall(p => p(f)))
    kept.map(f =>
      RdfFilePartition(f, RdfDataSource.formatOf(f, format))
        : InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the DRIVER's Hadoop conf to the readers: an executor-side
    // `new Configuration()` would drop every session key
    // (object-store credentials, endpoints, custom filesystem
    // settings), so the listing would succeed on the driver and every
    // reader would fail to open the same files. The conf rides INSIDE
    // the factory, not in an explicit sparkContext.broadcast: the
    // factory is part of the stage's task binary, which Spark itself
    // broadcasts once per stage AND garbage-collects via
    // ContextCleaner — an explicit broadcast per scan is never
    // destroyed and accumulates on long-lived sessions. Task binaries
    // also always use Java serialization (closure serializer),
    // so SerializableHadoopConf's writeObject hook is honored even
    // under spark.serializer=KryoSerializer.
    val spark = org.apache.spark.sql.SparkSession.active
    new RdfReaderFactory(required.fieldNames,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  }
}

private[sources] case class RdfFilePartition(file: String,
  format: String) extends InputPartition

/** Java-serializable Hadoop Configuration carrier (Spark's own
  * SerializableConfiguration is private[spark]): round-trips every
  * conf key through writeObject/readFields so the driver's session
  * conf reaches executor-side readers intact. */
private[sources] class SerializableHadoopConf(
  @transient var value: Configuration) extends java.io.Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] class RdfReaderFactory(fields: Array[String],
  conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
    : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RdfFilePartition]
    new RdfFileReader(p.file, p.format, fields, conf.value)
  }
  private[sources] def shippedConf: Configuration = conf.value
}

/** Reads ONE document: open (inflating .gz), parse with the shared
  * Rdf.parseDocument, emit pruned rows. Opens the file with the
  * DRIVER's broadcast Hadoop conf, so object-store credentials and
  * filesystem settings behave identically on both sides. */
private[sources] class RdfFileReader(file: String, format: String,
  fields: Array[String], conf: Configuration)
  extends PartitionReader[InternalRow] {

  private val triples: Iterator[graft.ttl.Turtle.Triple] = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
    val content =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    Rdf.parseDocument(file, content, format).iterator
  }
  private var current: graft.ttl.Turtle.Triple = _

  override def next(): Boolean =
    if (triples.hasNext) { current = triples.next(); true } else false

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "src_file" => UTF8String.fromString(file)
      case "s" => UTF8String.fromString(current.s)
      case "p" => UTF8String.fromString(current.p)
      case "o" => UTF8String.fromString(current.o)
    })

  override def close(): Unit = ()
}
