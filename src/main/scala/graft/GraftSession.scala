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
    // honor an externally supplied master (spark-submit --master):
    // only default to local[cores] when none is configured, so the
    // library entry point never forces a cluster job onto the driver
    val builder = SparkSession.builder()
      .config("spark.ui.enabled", "false")
    val withMaster =
      if (sys.props.contains("spark.master") ||
        sys.env.contains("SPARK_MASTER_URL")) builder
      else builder.master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        // shuffle.partitions=cores is right for query-sized inputs,
        // but a fixed reducer count starves big single-node jobs:
        // at 10M synthetic marks the ETL's window sort ran 32
        // partitions of ~312k fat rows each and spilled — 31.3k
        // marks/sec vs 65.0k with AQE given room to choose (r13
        // probe, BASELINE.md). initialPartitionNum hands AQE a high
        // starting split that it COALESCES back down when stages are
        // small, so query-sized work keeps ~cores partitions and
        // corpus-sized work fans out — the same posture a 1000-
        // executor cluster wants (initial ≫ cores, AQE right-sizes)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          (cores * 16).toString)
        // sort-based shuffle writer even at few partitions: the
        // bypass-merge writer creates numPartitions files per map
        // task, which crawls on slow local filesystems; >200-partition
        // production clusters never engage bypass anyway (local-mode
        // only — an external --master keeps the cluster's own setting)
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        // ContextCleaner needs GCs to reclaim shuffle/broadcast files;
        // long-lived local sessions otherwise accumulate block files
        // until queries crawl (the 30min default assumes cluster-sized
        // heaps that GC on their own)
        .config("spark.cleaner.periodicGC.interval", "45s")
    val spark = withMaster.getOrCreate()
    // runtime confs set unconditionally — getOrCreate may have
    // returned a pre-existing session whose builder configs were
    // silently dropped, and oracle-verified behavior requires these
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
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
