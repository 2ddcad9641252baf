package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query gets one
  * untimed warmup pass first — local[N] single-JVM timings are otherwise
  * dominated by JIT/codegen/classload warmup of whichever query happens
  * to run first, not by the plan being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val known = SparkEntry.queries.keySet
    val names = if (args.nonEmpty) {
      args.filterNot(known).foreach(n =>
        System.err.println(s"[bench] unknown query: $n (skipped)"))
      args.toSeq.filter(known)
    } else known.toSeq.sorted
    // warmup: one full pass (count) per query, untimed. Caches that
    // operators persist internally (TfIdf, SpanDedup, d2…) are
    // released after every pass: a timed pass must pay its own cache
    // build, and 100+ queries of accumulated caches would otherwise
    // squeeze execution memory for the rest of the run.
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
      finally graft.operators.Broadcasting.releaseAll()
    }
    // min of two timed passes: local[N] run-to-run variance is ±20%,
    // and min-of-k reports the plan's cost rather than scheduler
    // noise. A failing query reports -1, never its time-to-exception.
    def timeOne(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        None
      } finally graft.operators.Broadcasting.releaseAll()
    }
    val results = names.map { name =>
      name -> (timeOne(name), timeOne(name)) match {
        case (n, (Some(a), Some(b))) => n -> math.min(a, b)
        case (n, _) => n -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
