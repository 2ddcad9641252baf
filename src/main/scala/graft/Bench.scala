package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query gets one
  * untimed warmup pass first — local[N] single-JVM timings are otherwise
  * dominated by JIT/codegen/classload warmup of whichever query happens
  * to run first, not by the plan being measured.
  *
  * Every pass is wall-budgeted (`Budget.run`): a query that breaches
  * reports -1 and the suite moves on, so one pathological plan can
  * never starve the whole harness (round-7 failure mode). A warmup
  * breach also skips that query's timed passes — rerunning a known-DNF
  * query twice more would spend 3x the budget for zero signal.
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
      // sort-based shuffle writer, never bypass-merge: bypass creates
      // numPartitions files PER MAP TASK (32x32 per shuffle) and this
      // container's FS is slow at file creates — measured 40% of x10's
      // steady-state pass in DiskBlockObjectWriter.open/initialize.
      // Also the production shape: real clusters run >200 partitions,
      // where bypass never engages anyway.
      // r9 A/B, full 110-query suite at sf0.1, idle machine, same
      // binaries: sort-writer 45.1s vs bypass(200) 47.6s; median
      // per-query ratio 1.01 with the file-create-heavy shapes
      // clearly favoring sort (x10 0.89s vs 1.68s, m2 0.97s vs
      // 1.81s) and nothing losing more than ~20%. Verdict: keep 0.
      // The r8 outliers (j6 3.0s, x10 4.7s, x6/x7/x9 1.5-6x vs r6)
      // all vanished on re-run with UNCHANGED plans (j6 0.43s, x10
      // 0.89-1.03s) — run-context (loaded machine / FS debt), not
      // the sort-writer trade. Same for r9's x11 0.71s (code
      // unchanged since r7): isolated r10 Probe steady-state is
      // 0.34-0.44s across 5 runs.
      // SPARK_GRAFT_BYPASS exists only for that A/B; the driver never
      // sets it.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "0"))
      // ContextCleaner only deletes shuffle/broadcast files when a GC
      // collects their weak references; with an 8g heap and tiny SF
      // data a full GC may never happen, so block files pile up until
      // mid-suite queries crawl (measured: g4 47s -> 0.6s, j10 DNF ->
      // 1.2s once the cleaner runs on a 45s cadence vs the 30min
      // default)
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query shuffle-write tally (round-11 ask: make the FS-regime
    // sensitivity story empirical, not narrative). Sort-based shuffle
    // writes 1 data + 1 index file per map task with output, so
    // files = 2 × writing tasks; bytes come straight from task
    // metrics. Attribution = counter delta around the last timed
    // pass, after draining the async listener bus.
    val shuffleTasks = new java.util.concurrent.atomic.AtomicLong()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    // GroupedTopKExec SQLMetrics, tallied off the driver-side
    // accumulable updates (round-12 ask: record whether production
    // queries ever trip the operator's bounded-memory fallbacks —
    // expected 0 at sf0.1, which is headroom, not absence, because
    // gtkTasks witnesses every task the operator ran).
    val gtkTasks = new java.util.concurrent.atomic.AtomicLong()
    val gtkCapFlushes = new java.util.concurrent.atomic.AtomicLong()
    val gtkSortFallbacks = new java.util.concurrent.atomic.AtomicLong()
    def accLong(u: Any): Long = u match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case other => other.toString.toLong
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null && m.shuffleWriteMetrics.bytesWritten > 0) {
            shuffleTasks.incrementAndGet()
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
          if (t.taskInfo != null) t.taskInfo.accumulables.foreach { a =>
            a.name.zip(a.update).foreach {
              case (graft.plans.GroupedTopK.TasksMetricName, u) =>
                gtkTasks.addAndGet(accLong(u))
              case (graft.plans.GroupedTopK.CapFlushesMetricName, u) =>
                gtkCapFlushes.addAndGet(accLong(u))
              case (graft.plans.GroupedTopK.SortFallbacksMetricName, u) =>
                gtkSortFallbacks.addAndGet(accLong(u))
              case _ => ()
            }
          }
        }
      })
    def shuffleSnap(): (Long, Long, Long, Long, Long) = {
      org.apache.spark.GraftListenerShim.flush(spark.sparkContext)
      (shuffleTasks.get(), shuffleBytes.get(),
        gtkTasks.get(), gtkCapFlushes.get(), gtkSortFallbacks.get())
    }
    val known = SparkEntry.queries.keySet
    val names = if (args.nonEmpty) {
      args.filterNot(known).foreach(n =>
        System.err.println(s"[bench] unknown query: $n (skipped)"))
      args.toSeq.filter(known)
    } else known.toSeq.sorted
    // first pass pays codegen + classload + cache builds → 2x budget
    val warmupBudget = Budget.DefaultSec * 2
    // warmup: one full pass (count) per query, untimed. Caches that
    // operators persist internally (TfIdf, SpanDedup, d2…) are
    // released after every pass: a timed pass must pay its own cache
    // build, and 100+ queries of accumulated caches would otherwise
    // squeeze execution memory for the rest of the run.
    def onePass(name: String, budgetSec: Int): Budget.Result[Long] =
      try Budget.run(spark, name, budgetSec) {
        SparkEntry.queries(name)(spark, sfDir).count()
      } finally graft.operators.Broadcasting.releaseAll()
    // min of two timed passes: local[N] run-to-run variance is ±20%,
    // and min-of-k reports the plan's cost rather than scheduler
    // noise. A failing/timed-out query reports -1, never a partial time.
    val shuffleStats =
      scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    // per-query GroupedTopK counters: (tasks, capFlushes, sortFallbacks)
    // for queries whose last timed pass executed the operator
    val gtkStats =
      scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long, Long)]
    val results = names.map { name =>
      onePass(name, warmupBudget) match {
        case Budget.TimedOut =>
          System.err.println(s"[bench] $name TIMEOUT in warmup (${warmupBudget}s)")
          name -> -1.0
        case Budget.Failed(e) =>
          System.err.println(s"[bench] $name FAILED in warmup: $e")
          name -> -1.0
        case Budget.Done(_, _) =>
          val times = (1 to 2).flatMap { _ =>
            val (t0, b0, g0, c0, s0) = shuffleSnap()
            onePass(name, Budget.DefaultSec) match {
              case Budget.Done(_, sec) =>
                val (t1, b1, g1, c1, s1) = shuffleSnap()
                // last successful pass wins: shuffle volume is
                // plan-determined, identical across passes
                shuffleStats(name) = (2 * (t1 - t0), b1 - b0)
                if (g1 > g0) gtkStats(name) = (g1 - g0, c1 - c0, s1 - s0)
                Some(sec)
              case Budget.TimedOut =>
                System.err.println(s"[bench] $name TIMEOUT (${Budget.DefaultSec}s)")
                None
              case Budget.Failed(e) =>
                System.err.println(s"[bench] $name FAILED: $e")
                None
            }
          }
          name -> (if (times.nonEmpty) times.min else -1.0)
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = results.flatMap { case (k, _) =>
      shuffleStats.get(k).map { case (files, bytes) =>
        f""""$k":{"files":$files,"mb":${bytes / 1048576.0}%.2f}"""
      }
    }.mkString("{", ",", "}")
    val gtk = results.flatMap { case (k, _) =>
      gtkStats.get(k).map { case (tasks, caps, sorts) =>
        s""""$k":{"tasks":$tasks,"capFlushes":$caps,"sortFallbacks":$sorts}"""
      }
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_shuffle":$sh,"grouped_topk":$gtk,"sf":"$sfDir"}""")
    // Tail-survivable per-query seconds (round-12 ask #1): the driver
    // archives only the LAST 2000 chars of stdout, and the full line
    // above is ~3× that, so per-query times printed inside it are
    // truncated away (the r11 artifact lost exactly this field). This
    // second, compact line prints LAST: keys shortened to their
    // unique enumeration prefix ("x10_tfidf_top" → "x10" — prefixes
    // are unique across the whole suite by construction), values as
    // INTEGER centiseconds ("queries_cs" — 1.63 s prints as 163;
    // DNF's -1.0 as -100), which is 2-3 chars shorter per query than
    // a 2-decimal float and held 0.01 s resolution at 182 queries
    // where the decimal form had already overflowed to 0.1 s.
    def compactLine(unit: String, mult: Int): String = results.map {
      case (k, v) =>
        s""""${k.takeWhile(_ != '_')}":${math.round(v * mult)}"""
    }.mkString(s"""{"queries_$unit":{""", ",", "}}")
    // stay under the tail window with headroom as the suite grows:
    // drop to integer deciseconds before overflowing (0.1 s
    // resolution still adjudicates the regressions the gate cares
    // about)
    val cs = compactLine("cs", 100)
    println(if (cs.length <= 1900) cs else compactLine("ds", 10))
    spark.stop()
  }
}
