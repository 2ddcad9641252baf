package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import java.io.{BufferedOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

/** Document-per-path sink for (rel_path, ttl) frames — the engine's
  * K1/K2/K3/K4/K5 surface: exact output filenames (the reference's
  * contract: `<stem>.ttl`, `<image>.svs/<cancer>_<patch>.ttl.gz`,
  * `exec/img/batch_%06d.ttl.gz`), gzip when the path ends `.gz`,
  * skip-if-exists idempotence (K5, nuclear_segmentation_etl.py:
  * 299-307).
  *
  * Executed with foreachPartition: each task writes its partition's
  * documents — at scale this is embarrassingly parallel (one file per
  * document, no two tasks share a path because rel_path is unique).
  * The filesystem is resolved from `outDir`'s scheme, so the SAME
  * call targets HDFS or S3A on a cluster — not only executor-local
  * disks. Two write strategies behind one API:
  *  - remote schemes (hdfs, s3a, …) go through Hadoop
  *    `FileSystem`/`FileContext` with an ATOMIC overwrite rename;
  *  - `file:`/bare paths use `java.nio` directly with
  *    `ATOMIC_MOVE` — same temp+rename discipline, but avoiding
  *    Hadoop's local-FS permission shell-outs (RawLocalFileSystem
  *    exec's `chmod` per file when libhadoop is absent — a fork per
  *    document would dominate a many-small-files sink).
  * Either way a killed job never leaves a torn file and re-runs are
  * idempotent.
  */
object TtlFileSink {

  /** Writes each (rel_path, ttl) row under outDir. Returns nothing;
    * use `skipExisting = true` for resume semantics (K5/T3). */
  def write(docs: DataFrame, outDir: String,
    skipExisting: Boolean = false): Unit = {
    // Resolve the path through Hadoop's OWN resolution (driver-side):
    // a bare "/data/rdf" with fs.defaultFS=hdfs://… must go to HDFS,
    // not to each executor's local disk. Only a path that RESOLVES to
    // the local filesystem takes the java.nio fast path.
    val conf = docs.sparkSession.sessionState.newHadoopConf()
    val scheme = new HPath(outDir).getFileSystem(conf).getScheme
    if (scheme == "file") writeLocal(docs, outDir, skipExisting)
    else writeHadoop(docs, outDir, skipExisting)
  }

  /** Local fast path: plain java.nio, atomic move, no subprocesses. */
  private def writeLocal(docs: DataFrame, outDir: String,
    skipExisting: Boolean): Unit = {
    import java.nio.file.{Files, Paths}
    // strip a file: scheme if present; Paths.get wants a plain path
    val out = new HPath(outDir).toUri.getPath match {
      case null | "" => outDir
      case p => p
    }
    docs.select("rel_path", "ttl").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val rel = r.getString(0)
          val content = r.getString(1)
          val target = Paths.get(out, rel)
          if (!(skipExisting && Files.exists(target))) {
            Files.createDirectories(target.getParent)
            val tmp = target.resolveSibling(target.getFileName.toString +
              ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
            writeStream(Files.newOutputStream(tmp), content,
              rel.endsWith(".gz"))
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        }
    }
  }

  /** Cluster path: Hadoop FileSystem/FileContext for hdfs/s3a/….
    * (private[graft] so the spec can drive it through a file: URI —
    * the write() dispatcher routes local schemes to writeLocal.) */
  private[graft] def writeHadoop(docs: DataFrame, outDir: String,
    skipExisting: Boolean): Unit = {
    val out = outDir // serialize the string, not the config object
    // Hadoop Configuration is not serializable — broadcast its
    // effective entries (includes spark.hadoop.* overrides) ONCE per
    // executor instead of shipping hundreds of entries in every task
    // closure, and rebuild per task.
    val confEntries = {
      val c = docs.sparkSession.sessionState.newHadoopConf()
      val it = c.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      docs.sparkSession.sparkContext.broadcast(b.result())
    }
    docs.select("rel_path", "ttl").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val conf = new Configuration(false)
          confEntries.value.foreach { case (k, v) => conf.set(k, v) }
          val outPath = new HPath(out)
          val fs = outPath.getFileSystem(conf)
          // FileContext gives the ATOMIC overwrite rename FileSystem
          // lacks — no delete-then-rename window where a previously
          // complete output file is missing.
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri, conf)
          // Build child paths from (scheme, authority, path-string) so
          // rel_path is never URI-PARSED: an exec id like "run:2020-01"
          // or a '#' in a path segment must not become a scheme or
          // fragment.
          val q = fs.makeQualified(outPath).toUri
          def child(rel: String): HPath =
            new HPath(q.getScheme, q.getAuthority,
              q.getPath.stripSuffix("/") + "/" + rel)
          rows.foreach { r =>
            val rel = r.getString(0)
            val content = r.getString(1)
            val target = child(rel)
            if (!(skipExisting && fs.exists(target))) {
              fs.mkdirs(target.getParent)
              val tmp = new HPath(target.getParent, target.getName +
                ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
              writeStream(fs.create(tmp, true), content,
                rel.endsWith(".gz"))
              // atomic replace: concurrent/speculative attempts of the
              // same rel_path write identical content, last one wins
              fc.rename(tmp, target,
                org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            }
          }
        }
    }
  }

  /** Driver-side recovery sweep: delete orphaned `*.tmp-*` files a
    * KILLED run left behind (under the atomic-rename protocol a temp
    * is garbage the moment its process dies — no reader ever opens
    * one, but a crash-then-resume loop would otherwise accrete them
    * forever). Full recursive listing of `dir` — call once at
    * process start when resuming a batch tree, never per micro-batch
    * (the streaming sink's zero-listing discipline stands). Returns
    * the number of temps deleted. */
  def sweepOrphanedTemps(spark: org.apache.spark.sql.SparkSession,
    dir: String): Long = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    // anchored to the protocol's exact suffix shape (".tmp-" + 8 hex
    // uuid chars at END of name): rel_path is caller-supplied, so a
    // committed output whose leaf merely CONTAINS ".tmp-" must never
    // be swept as garbage
    val tempName = ".*\\.tmp-[0-9a-f]{8}$".r
    while (it.hasNext) {
      val f = it.next()
      if (tempName.matches(f.getPath.getName)) {
        fs.delete(f.getPath, false); n += 1
      }
    }
    n
  }

  private def writeStream(raw: OutputStream, content: String,
    gzip: Boolean): Unit = {
    val os = if (gzip)
      // level 6 matches the reference (mongodb_to_rdf.py:37)
      new GZIPOutputStream(new BufferedOutputStream(raw)) {
        `def`.setLevel(6)
      }
    else new BufferedOutputStream(raw)
    try os.write(content.getBytes(StandardCharsets.UTF_8))
    finally os.close()
  }
}
