package graft.pipelines

import org.apache.spark.sql.DataFrame
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
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
  * Writes go to a temp file + atomic rename, so a killed job never
  * leaves a torn file and re-runs are idempotent.
  */
object TtlFileSink {

  /** Writes each (rel_path, ttl) row under outDir. Returns nothing;
    * use `skipExisting = true` for resume semantics (K5/T3). */
  def write(docs: DataFrame, outDir: String,
    skipExisting: Boolean = false): Unit = {
    val out = outDir // serialize the string, not the config object
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
            writeFile(tmp, content, rel.endsWith(".gz"))
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        }
    }
  }

  private def writeFile(p: Path, content: String, gzip: Boolean): Unit = {
    val fos = new FileOutputStream(p.toFile)
    val os = if (gzip)
      // level 6 matches the reference (mongodb_to_rdf.py:37)
      new GZIPOutputStream(new BufferedOutputStream(fos)) {
        `def`.setLevel(6)
      }
    else new BufferedOutputStream(fos)
    try os.write(content.getBytes(StandardCharsets.UTF_8))
    finally os.close()
  }
}
