package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-repair toolkit: the engine's replacement for the reference's
  * sha256-hash/ scripts (SURVEY S8/S9/F9/F13/F14/K8 — update_hashes*.py,
  * update_ttl_gz_from_json.py, sha256-csv-2019.py, remove_loinc_*.sh).
  *
  * The reference mutates .ttl.gz files in place (gzip → regex → regzip,
  * update_ttl_gz_from_json.py:43-83). In-place update is anti-Spark
  * (K8): this job reads the TTL tree, rewrites, and emits a NEW
  * snapshot directory via TtlFileSink — idempotent and atomic at file
  * granularity, so a killed run is just re-run.
  *
  * Scale: whole-file rows (one per .ttl.gz, ~5-20 MB gz — Turtle File
  * Summary.md:46) over ~4M files; slide→hash lookup is broadcast; the
  * rewrite is a narrow map. File-count parallelism replaces the
  * reference's `Pool(20)`/`xargs -P 20`.
  */
object HashRepairJob {

  /** F9/GEN-SH replacement: real SHA-256 of image files via the
    * binaryFile source — builds the (slide, real_hash) lookup that the
    * reference computed with a generated bash script + sha256sum.
    *
    * KEY CONVENTION: `slide` here EXCLUDES the `.svs` extension
    * ("slide-42"), matching the mongo documents' `image.slide` field
    * (MongoMarksPipeline). `repair()`/`readTtlTree` and the
    * reference's slide_hashes.json key by FOLDER name, which INCLUDES
    * `.svs` ("slideA.svs") — append the extension before feeding this
    * frame into `repair()`. */
  def buildHashLookup(spark: SparkSession, svsGlob: String): DataFrame =
    spark.read.format("binaryFile").load(svsGlob)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.svs$", 1).as("slide"),
        sha2(col("content"), 256).as("real_hash"))

  /** S9: slide_hashes.json list of {slide, hash} → lookup frame.
    * multiLine: the reference's file is ONE pretty-printed JSON array
    * (json.dump default), not JSONL — without this option Spark reads
    * it as a corrupt record. */
  def loadHashJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)
      .select(col("slide"), lower(col("hash")).as("real_hash"))

  /** S8: whole-file scan of `<base>/<slide>.svs/batch_*.ttl.gz`
    * (gzip transparent), one row per file with its slide key. */
  def readTtlTree(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.option("wholetext", true)
      .text(baseDir + "/*.svs/*.ttl.gz")
      // DECODED: a slide dir with a space would otherwise never match
      // its slide_hashes.json key (silently unrepaired) and the new
      // snapshot would land under the %20-spelled directory
      .withColumn("path", PathMeta.decodedInputFileName())
      .withColumn("slide",  // folder name INCLUDING .svs, like the
        // reference's svs_folder.name lookup key (:119-121)
        regexp_extract(col("path"), "/([^/]+\\.svs)/[^/]+$", 1))
      .withColumn("rel_path",
        regexp_extract(col("path"), "/([^/]+\\.svs/[^/]+)$", 1))
      .select(col("rel_path"), col("slide"), col("value").as("ttl"))

  /** F13: replace every `<urn:sha256:hex>` subject with the slide's
    * real hash; if none present, upgrade `<urn:md5:hex>` instead
    * (update_ttl_gz_from_json.py:60-73). Files whose slide has no
    * lookup entry pass through unchanged (flagged `repaired=false`). */
  def repair(ttlFiles: DataFrame, hashLookup: DataFrame): DataFrame =
    ttlFiles
      // size-gated by ROW COUNT (byte estimates lie for the
      // binaryFile-derived buildHashLookup variant): one row per
      // slide image — degrade to a shuffle join past the cap
      .join(graft.operators.Broadcasting.maybeBroadcastByCount(hashLookup),
        Seq("slide"), "left")
      .withColumn("replacement",
        concat(lit("<urn:sha256:"), col("real_hash"), lit(">")))
      .withColumn("has_sha", col("ttl").rlike("<urn:sha256:[0-9a-fA-F]+>"))
      .withColumn("has_md5", col("ttl").rlike("<urn:md5:[0-9a-fA-F]+>"))
      .withColumn("repaired",
        col("real_hash").isNotNull && (col("has_sha") || col("has_md5")))
      .withColumn("ttl",
        when(col("real_hash").isNull, col("ttl"))
          .when(col("has_sha"), regexp_replace(col("ttl"),
            lit("<urn:sha256:[0-9a-fA-F]+>"), col("replacement")))
          .when(col("has_md5"), regexp_replace(col("ttl"),
            lit("<urn:md5:[0-9a-fA-F]+>"), col("replacement")))
          .otherwise(col("ttl")))
      .select("rel_path", "slide", "ttl", "repaired")

  /** F14: drop `@prefix loinc:` header lines (remove_loinc_xargs.sh:6
    * — `grep -Fv` per file), as a whole-file rewrite. */
  def removeLoincPrefix(ttlFiles: DataFrame): DataFrame =
    ttlFiles.withColumn("ttl",
      // \n? — a loinc prefix as the file's LAST line (no terminating
      // newline) must be removed too, as grep -Fv would
      regexp_replace(col("ttl"), "(?m)^@prefix loinc:[^\n]*\n?", ""))

  /** Full job: read tree → repair hashes → strip loinc → new snapshot
    * under outDir (same relative layout, gzip preserved by suffix). */
  def run(spark: SparkSession, baseDir: String, hashJsonPath: String,
    outDir: String): Long = {
    val lookup = loadHashJson(spark, hashJsonPath)
    val repaired = removeLoincPrefix(
      repair(readTtlTree(spark, baseDir), lookup))
    // two actions (count + write) run as two SCANS of the gz tree —
    // NOT a persist: caching would hold the whole DECOMPRESSED corpus
    // (far beyond the ~5-20 MB/file gz sizes, ×4M files) in executor
    // memory/disk. The count plan prunes the rewritten ttl column
    // entirely (repaired derives from the ORIGINAL text's rlike), so
    // the second decompression pass is the whole extra cost.
    try {
      val n = repaired.filter(col("repaired")).count()
      TtlFileSink.write(repaired.select("rel_path", "ttl"), outDir)
      n
    } finally {
      // repair() size-gated its lookup via maybeBroadcastByCount,
      // which persists — reclaim that cache now that the job is done
      graft.operators.Broadcasting.releaseAll()
    }
  }
}
