package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way the engine
  * expects (UTC, AQE on, right-sized shuffle partitions, graft
  * expressions registered), plus catalog registration of the testdata
  * tables for `spark.sql` users.
  *
  * On a real cluster the same knobs apply — shuffle partitions sized
  * to cores (not the 200 default), AQE for runtime coalescing/skew
  * joins; `spark.sql.extensions=graft.expressions.GraftExtensions`
  * replaces the explicit register call under spark-submit.
  */
object GraftSession {

  def create(cores: Int = Runtime.getRuntime.availableProcessors())
    : SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.GraftFunctions.register(spark)
    spark
  }

  /** Register every testdata table as a temp view so `spark.sql`
    * works directly (`SELECT ... FROM lineitem`). */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      Tables.load(spark, dir, name).createOrReplaceTempView(name)
    }
}
