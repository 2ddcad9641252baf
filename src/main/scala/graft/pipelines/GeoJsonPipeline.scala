package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON → GeoSPARQL TTL pipeline (§3.1 of SURVEY; reference entry
  * point json-etl/geojson_to_geosparql_etl.py:252-265).
  *
  * One declarative plan replaces the reference's 20-process pool:
  * multiLine JSON scan (S1) → posexplode features → map-argmax dominant
  * class (A1, strict `>` first-max tie-break, :45-60) → literal-map
  * SNOMED lookup (J1 — constant-folded, zero shuffle, vs. a broadcast
  * join) → raw-format outer-ring WKT (F1, :27-42 — ring NOT closed,
  * Python str() float formatting) → per-file Turtle assembly (F17)
  * with ";\n" member separators → one .ttl per input stem (K1).
  *
  * The only shuffle is the groupBy(file) assembly; at 100 TB the unit
  * of work is a file (471-file corpus in the reference, :256), so
  * partition-by-file parallelism is exactly the reference's pool
  * parallelism, minus the driver-side loop. Clock is injected for
  * deterministic goldens (reference stamps wall-clock, :83).
  */
object GeoJsonPipeline {

  /** SNOMED tissue-class mapping (json-etl/geojson_to_geosparql_etl
    * .py:13-24). */
  val SnomedMappings: Map[String, String] = Map(
    "400p-Acinar tissue" -> "http://snomed.info/id/73681006",
    "400p-Dysplastic epithelium" -> "http://snomed.info/id/61313004",
    "400p-Fibrosis" -> "http://snomed.info/id/112674009",
    "400p-Lymph Aggregates" -> "http://snomed.info/id/267190001",
    "400p-Necrosis" -> "http://snomed.info/id/6574001",
    "400p-Nerves" -> "http://snomed.info/id/88545005",
    "400p-Normal ductal epithelium" -> "http://snomed.info/id/27834005",
    "400p-Reactive" -> "http://snomed.info/id/11214006",
    "400p-Stroma" -> "http://snomed.info/id/128752000",
    "400p-Tumor" -> "http://snomed.info/id/108369006")

  /** SNOMED ids (URI tails) keyed by class — the engine-side J1 lookup
    * table, applied as a constant-folded literal map column. */
  private val snomedIdMap: Column = {
    val entries = SnomedMappings.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v.split("/").last))
    }
    map(entries: _*)
  }

  val geojsonSchema: StructType = StructType(Seq(
    StructField("features", ArrayType(StructType(Seq(
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates",
          ArrayType(ArrayType(ArrayType(DoubleType))))))),
      StructField("properties", StructType(Seq(
        StructField("measurements", MapType(StringType, DoubleType)))))))))))

  /** S1 scan: one row per .geojson file with filename-derived image id
    * (F5, :63-69). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("multiLine", true).schema(geojsonSchema)
      .json(dir + "/*.geojson")
      .withColumn("filename", // decoded: a space in the file name must
        // not become %20 in the stem/image_id or the output file name
        element_at(split(PathMeta.decodedInputFileName(), "/"), -1))
      .withColumn("stem", regexp_replace(col("filename"),
        "\\.geojson$", ""))
      .withColumn("image_id", element_at(split(col("stem"), "\\."), 1))
      .withColumn("image_hash", sha2(col("image_id"), 256))

  /** A1: dominant `prob_*` class via strict-`>` fold in map iteration
    * order (first max wins; all-zero → '' → dropped). */
  private val dominant: Column = expr(
    """aggregate(map_entries(measurements),
      | named_struct('cls', '', 'prob', cast(0.0 as double)),
      | (acc, e) -> IF(startswith(e.key, 'prob_')
      |     AND e.value > acc.prob,
      |   named_struct('cls', substring(e.key, 6), 'prob', e.value),
      |   acc))""".stripMargin)

  /** F1: outer-ring WKT, raw float formatting, NO ring closure. A
    * degenerate point ([], [x]) yields NULL and the feature is
    * skipped. DELIBERATE deviation: json-etl's polygon_to_wkt
    * (json-etl:27-42) has no try/except, so its IndexError propagates
    * to process_single_file's file-level except (json-etl:208) and
    * the reference emits NO output file for that input; the
    * bare-except → None → skip-the-feature pattern belongs to
    * mongo-etl's polygon_to_wkt (mongodb_to_rdf.py:240-261). We skip
    * at feature level (keeping the rest of the document) rather than
    * dropping the whole file or aborting the job under Spark 4's
    * default ANSI mode — one dirty feature should not erase its
    * siblings' output at 100 TB. */
  private val wktRaw: Column = {
    val ring = expr("geometry.coordinates[0]")
    when(expr("size(geometry.coordinates) >= 1") &&
      size(ring) >= 1 &&
      expr("forall(geometry.coordinates[0], p -> size(p) >= 2)"),
      concat(lit("POLYGON (("),
        concat_ws(", ", expr(
          """transform(geometry.coordinates[0],
            | p -> concat(cast(p[0] as string), ' ',
            |             cast(p[1] as string)))""".stripMargin)),
        lit("))")))
  }

  // hal:measurement sub-blocks: every mapped prob_* entry with a
  // NON-NULL value (a JSON null would print as the invalid literal
  // "null"^^xsd:float), ','-joined, "%.6f" floats (:160-176).
  // Column-API lambdas reuse the single snomedIdMap literal (no
  // duplicated SQL-string encoding).
  private def entryCls(e: Column): Column = {
    val k = e.getField("key")
    element_at(snomedIdMap, k.substr(lit(6), length(k)))
  }
  private val measurementFrag: Column = concat_ws(",", transform(
    filter(map_entries(col("measurements")), e =>
      e.getField("key").startsWith("prob_") &&
        e.getField("value").isNotNull && entryCls(e).isNotNull),
    e => concat(
      lit("\n                                             [ hal:classification  sno:"),
      entryCls(e),
      lit(";\n                                               hal:hasProbability  \""),
      format_string("%.6f", e.getField("value")),
      lit("\"^^xsd:float\n                                             ]"))))

  private val fragmentCol: Column = concat(
    lit("        rdfs:member          [ a                   geo:Feature;\n" +
      "                               geo:hasGeometry     [ geo:asWKT  \""),
    col("wkt"),
    lit("\"^^geo:wktLiteral ];\n" +
      "                               hal:classification  sno:"),
    col("snomed_id"),
    lit(";\n                               hal:measurement     "),
    measurementFrag,
    lit("\n                             ]"))

  /** One row per (file, feature) with validity columns; `pos` keeps
    * document order. posexplode_OUTER: an empty file still yields one
    * row, so `documents` needs no second scan for headers. */
  private def explodedFeatures(files: DataFrame): DataFrame = files
    .select(col("stem"), col("image_id"), col("image_hash"),
      posexplode_outer(col("features")).as(Seq("pos", "f")))
    .select(col("stem"), col("image_id"), col("image_hash"), col("pos"),
      col("f.geometry").as("geometry"),
      col("f.properties.measurements").as("measurements"))
    .withColumn("dom", dominant)
    .withColumn("cls", col("dom.cls"))
    .withColumn("snomed_id", element_at(snomedIdMap, col("cls")))
    .withColumn("wkt", wktRaw)

  /** Per-feature TTL fragments for the valid features of every file. */
  def features(files: DataFrame): DataFrame =
    explodedFeatures(files)
      .filter(col("snomed_id").isNotNull && col("wkt").isNotNull)
      .withColumn("fragment", fragmentCol)

  /** Full document per file: header + ";\n"-joined member fragments +
    * " .\n" terminator (empty files keep header + terminator, like the
    * reference). `timestamp` is the injected clock (ISO-8601 `Z`).
    *
    * ONE scan: headers ride the same exploded rows (posexplode_outer
    * keeps a row for empty files), so the multiLine JSON corpus is
    * read and parsed once — not once for members and again for the
    * header side of a rejoin. */
  def documents(files: DataFrame, timestamp: String): DataFrame = {
    val frags = explodedFeatures(files)
      .withColumn("fragment",
        when(col("snomed_id").isNotNull && col("wkt").isNotNull,
          fragmentCol))
      .groupBy(col("stem"), col("image_id"), col("image_hash"))
      // collect_list skips NULL structs, so invalid features drop out
      // while their file's group (and header) survives
      .agg(concat_ws(";\n", expr("transform(array_sort(collect_list(" +
        "CASE WHEN fragment IS NOT NULL" +
        " THEN named_struct('pos', pos, 'f', fragment) END))," +
        " x -> x.f)")).as("members"))

    frags
      .select(col("stem"), concat(
        lit(graft.ttl.Turtle.PrefixHeader),
        format_string(
          "<urn:sha256:%s>\n        a            so:ImageObject;\n" +
            "        dc:identifier \"%s\" ;\n" +
            "        exif:height  \"40000\"^^xsd:int;\n" +
            "        exif:width   \"40000\"^^xsd:int .\n\n",
          col("image_hash"), col("image_id")),
        format_string(
          "<>      a                    geo:FeatureCollection;\n" +
            "        dc:creator           \"http://orcid.org/0000-0003-4165-4062\";\n" +
            "        dc:date              \"%s\"^^xsd:dateTime;\n" +
            "        dc:description       \"Raj's 10-class classification results produced via wsinfer and Tammy's PyTorch model for %s\";\n" +
            "        dc:title             \"tissue-classification-predictions\";\n" +
            "        prov:wasGeneratedBy  [ a                       prov:Activity;\n" +
            "                               prov:used               <urn:sha256:%s>;\n" +
            "                             ];\n",
          lit(timestamp), col("image_id"), col("image_hash")),
        col("members"), lit(" .\n")).as("ttl"))
  }

  /** End-to-end: dir of .geojson → Dataset of (stem, ttl); sink via
    * TtlFileSink.write (one `<stem>.ttl` per input — K1). */
  def run(spark: SparkSession, inDir: String, timestamp: String)
    : DataFrame =
    documents(read(spark, inDir), timestamp)
}
