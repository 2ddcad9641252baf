package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-more-rung scale probe for the super-linear-suspect families:
  * times selected queries on sf0.1 and on a synthetic 10× documents
  * corpus, printing per-query ratios and output rows. Not part of the
  * driver contract — a diagnostic main backing BASELINE.md's ladder
  * table (the sf0.01→sf0.1 rung is recorded there; this adds
  * sf0.1→10×).
  *
  * The 10× corpus (built once under target/scale10) must NOT be ten
  * verbatim replicas — that would hand every document nine synthetic
  * near-dups and the pair-generating queries would blow up BY
  * CONSTRUCTION, drowning the plan-shape signal being measured.
  * Replica r>0 of doc i instead splices the first half of doc i with
  * the second half of doc (i + 137·r mod n): shingle/vocabulary
  * statistics stay corpus-like, but splice-to-source Jaccard lands
  * ~1/3, under every dedup threshold in the suite.
  */
object ScaleLadder {

  private val DefaultQueries = Seq("d2_ngram_jaccard", "d4_lsh_pairs",
    "d6_simhash_pairs", "d11_containment", "x10_tfidf_top",
    "x12_bm25_topk")

  def build10x(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = base.count()
    val partner = base.select(col("doc_id").as("pid"),
      col("text").as("ptext"))
    val replicas = (0 until 10).map { r =>
      if (r == 0) base
      else base
        .withColumn("pid", (col("doc_id") + lit(137L * r)) % lit(n))
        .join(partner, "pid")
        .select(
          (col("doc_id") + lit(r * 1000000L)).as("doc_id"),
          concat(
            expr("substring(text, 1, cast(length(text)/2 as int))"),
            lit(" "),
            expr("substring(ptext, cast(length(ptext)/2 as int)+1, " +
              "length(ptext))")).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicas.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  private def time(spark: SparkSession, name: String, dir: String)
    : (Double, Long) = {
    def pass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.Broadcasting.releaseAll()
      (sec, rows)
    }
    pass() // warmup
    val (s1, rows) = pass()
    val (s2, _) = pass()
    (math.min(s1, s2), rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE10_DIR",
      "target/scale10")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      build10x(spark, sfDir, out)
      println(s"[ladder] built 10x corpus at $out")
    }
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    names.foreach { name =>
      val (s1, r1) = time(spark, name, sfDir)
      val (s10, r10) = time(spark, name, out)
      println(f"[ladder] $name%-18s sf0.1 $s1%6.2fs ($r1%d rows)  " +
        f"10x $s10%6.2fs ($r10%d rows)  time x${s10 / s1}%.2f  " +
        f"rows x${r10.toDouble / math.max(r1, 1)}%.2f")
    }
    spark.stop()
  }
}
