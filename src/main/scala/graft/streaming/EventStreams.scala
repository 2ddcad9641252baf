package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events schema (event_id,
  * ts, user_id, event_type, value, props). The reference's incremental
  * machinery (cursor micro-batching T1, durable checkpoint T2 —
  * mongo-etl/mongodb_to_rdf.py:515,528-579,114-192) maps to
  * Structured Streaming micro-batches + checkpointLocation; these
  * transforms are the streaming faces of the batch queries in
  * operators.EventTimeQueries and are plan-compatible with both
  * readStream and batch DataFrames (except the stateful ones, which
  * are streaming-only).
  *
  * Scale: watermark + windowed agg keeps state bounded per (window,
  * key); session/custom state is per-key and evicted on timeout.
  * At 1000 executors the state store partitions by the group key —
  * the same shuffle key the batch variants use.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** The e6 score quantization shared by every scored stateful
    * operator (leaderboard ranks, session totals) — ONE spelling so
    * cross-operator score comparability stays replay-exact by
    * construction. A NaN value has no meaningful quantization
    * (`NaN.toLong` is silently 0, which would seat an ingest defect
    * on the leaderboard at score 0 and evict real history): it fails
    * loudly here; feeds that can carry NaN pre-filter with
    * `!isnan(value)`. */
  private def quantizeE6(v: Double): Long = {
    require(!v.isNaN,
      "event value is NaN — no meaningful e6 quantization exists " +
        "(ingest defect); pre-filter !isnan(value) on dirty feeds")
    math.floor(v * 1e6 + 0.5).toLong
  }

  /** Tumbling 1-hour counts per event type; late data beyond the
    * watermark is dropped (no late-data handling exists in the
    * reference — SURVEY §2.10). */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour")
    : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Session windows with a 30-minute inactivity gap per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes")
    : DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sess.start").as("sess_start"),
        col("sess.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming face of d1_exact_dedup (state = one key per id seen,
    * evicted as the watermark passes). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour")
    : DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state (T2 checkpoint-analog bookkeeping): running
    * per-user totals via flatMapGroupsWithState, emitting an update per
    * micro-batch in which the user appeared. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserAgg(userId, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  case class BoardState(entries: List[(Long, Long)])
  case class LeaderEntry(event_type: String, rank: Int, user_id: Long,
    best_e6: Long)

  /** Streaming per-group top-k leaderboard — the streaming face of
    * the GroupedTopK batch operator: per event_type, the k best
    * (user, score) pairs across the whole stream, refreshed each
    * micro-batch a group is touched. Scores quantize e6 on ingest so
    * rank order (score desc, user asc) is exact and replayable.
    *
    * State is BOUNDED at k entries per group — the same admission
    * contract as the batch heap: a new score enters iff it beats the
    * current k-th; a user already on the board keeps their best.
    * The deliberate consequence (standard bounded-leaderboard
    * semantics): history below the k-boundary is forgotten, so
    * re-entry requires beating today's k-th, not yesterday's.
    * Untouched groups emit nothing (their board stands). */
  def leaderboard(events: Dataset[Event], k: Int)
    : Dataset[LeaderEntry] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[BoardState, LeaderEntry](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[Event], state: GroupState[BoardState]) =>
          val batchBest = rows.foldLeft(Map.empty[Long, Long]) { (m, e) =>
            val s = quantizeE6(e.value)
            m.updated(e.user_id,
              math.max(s, m.getOrElse(e.user_id, Long.MinValue)))
          }
          if (batchBest.isEmpty) Iterator.empty
          else {
            val cur = state.getOption.map(_.entries).getOrElse(Nil)
            val merged = (cur ++ batchBest.toList)
              .groupMapReduce(_._1)(_._2)(math.max)
              .toList
              .sortBy { case (u, s) => (-s, u) }
              .take(k)
            state.update(BoardState(merged))
            merged.iterator.zipWithIndex.map { case ((u, s), i) =>
              LeaderEntry(etype, i + 1, u, s)
            }
          }
      }
  }

  case class SessState(startMs: Long, lastMs: Long, n: Long, totalE6: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_e6: Long)

  /** Timer-driven sessionization on Spark 4's transformWithState —
    * the arbitrary-state API that succeeds flatMapGroupsWithState.
    * What the declarative `session_window` spelling ([[sessionCounts]])
    * cannot express: a session CLOSES — and its summary row EMITS —
    * the moment the event-time watermark passes `lastEvent + gap`,
    * via a registered per-key timer, instead of waiting for the
    * user's next event (or query end) to flush the aggregation. The
    * monitoring shape: "tell me when the user went quiet".
    *
    * State: ONE SessState per live user (start, last, count, e6 value
    * sum — scores quantize e6 on ingest, replay-exact), plus one
    * armed timer per live user, re-armed to the new horizon on every
    * batch the user appears in (old timer deleted — timers never
    * accumulate). Sessions also split WITHIN a batch when successive
    * events sit further than `gap` apart (batch rows sort by event
    * time first). State and timers clear on close, so a quiet user
    * costs nothing — bounded by LIVE users, not seen users.
    *
    * Late/out-of-order contract: rows below the current watermark are
    * dropped on arrival (transformWithState doesn't do this for you;
    * a below-watermark event could otherwise re-open a session its
    * timer already emitted). An in-watermark event that precedes the
    * open session by MORE than `gap` splits into its own earlier
    * session (never stretches session_start backwards across a
    * silence); such early sessions finalize at the end of the batch
    * that carried them — the one deviation from `session_window`'s
    * full merge semantics, forced by the single-ValueState design.
    *
    * Disjointness guarantee: emitted session spans are pairwise
    * disjoint per user. Sessions emitted EAGERLY (early sessions at
    * batch end; an open session closed by a gap-exceeding successor)
    * emit before the watermark passes them, so a still-in-watermark
    * predecessor could arrive in a LATER batch inside an
    * already-emitted span; a per-key horizon (max emitted
    * session_end) drops such events on arrival. This is the
    * session_window-faithful choice: under its emission discipline a
    * session only emits once the watermark passed it, making any
    * later arrival inside the span a below-watermark drop anyway —
    * the horizon applies the same rule to the eagerly-emitted spans
    * (consumers never see overlapping rows; the dropped event is the
    * price of Append-mode immutability, not a new failure mode).
    *
    * The single-Long horizon is deliberately CONSERVATIVE: it drops
    * every in-watermark arrival at or before the max emitted end —
    * including a gap event that overlaps NO emitted span (spans
    * (11:00,11:05) and (11:50,12:00) emitted, then 11:20 arrives:
    * dropped, though a disjoint (11:20,11:20) session existed).
    * Tracking only the last span's START to narrow the drop would
    * break the guarantee it exists for: two keepable events
    * straddling an emitted span ((10:59, 11:06) around (11:00,11:05)
    * within one gap) would merge into a session CONTAINING the span
    * — overlap. Narrowing safely needs the full in-watermark span
    * set per key plus splitting sessions at span boundaries; until a
    * consumer needs those gap events, the bounded-state conservative
    * drop is the contract (spec-pinned, gap-event case included).
    *
    * Requires the RocksDB state store provider (a transformWithState
    * constraint) and an event-time watermark on `ts`; scale-wise the
    * state partitions by user exactly like the other keyed stateful
    * operators. */
  def sessionizeWithTimers(events: Dataset[Event], gapMs: Long,
    watermark: String = "1 hour"): Dataset[SessionOut] = {
    require(gapMs > 0, s"gap must be positive, got $gapMs")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** The per-key machinery behind [[sessionizeWithTimers]]. */
  private class SessionTimerProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, SessionOut] {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var sess: ss.ValueState[SessState] = _
    // max session_end (ms) this key has EMITTED — the disjointness
    // horizon (class doc): events at or before it fall inside or
    // behind an already-emitted span and drop on arrival
    @transient private var horizon: ss.ValueState[Long] = _

    override def init(outputMode: OutputMode,
      timeMode: ss.TimeMode): Unit = {
      sess = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], ss.TTLConfig.NONE)
      horizon = getHandle.getValueState[Long]("horizon",
        Encoders.scalaLong, ss.TTLConfig.NONE)
    }

    private def closed(userId: Long, s: SessState) = SessionOut(userId,
      new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
      s.n, s.totalE6)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
      tv: ss.TimerValues): Iterator[SessionOut] = {
      // transformWithState does NOT auto-drop rows older than the
      // watermark (unlike the declarative operators): a late event
      // arriving after a timer already closed its session would
      // otherwise re-open a phantom session and emit an overlapping
      // Append row. Drop them here, like session_window would.
      val wm = tv.getCurrentWatermarkInMs()
      // two drop rules: below-watermark (session_window's own), and
      // at-or-before the emitted horizon (disjointness, class doc)
      val hor = if (horizon.exists()) horizon.get() else Long.MinValue
      // once the watermark strictly passes the horizon, the wm rule
      // subsumes it — clear, so horizon state stays bounded by users
      // with a recently-emitted eager span, not by users ever seen
      if (horizon.exists() && hor < wm) horizon.clear()
      val evs = rows.toArray
        .filter(e => e.ts.getTime >= wm && e.ts.getTime > hor)
        .sortBy(_.ts.getTime)
      var out = List.empty[SessionOut]
      var cur = if (sess.exists()) sess.get() else null
      // `early` builds sessions that PRECEDE the carried-over open
      // session by more than `gap` (out-of-order across batches, yet
      // inside the watermark): without it such an event would merge
      // into `cur` and stretch session_start backwards across a
      // silence longer than the gap. Deviation from session_window's
      // full merge semantics, forced by the single-ValueState design:
      // early sessions finalize at the end of THIS batch — an even
      // later-arriving predecessor in a FUTURE batch starts its own
      // session instead of retro-merging (documented, Append-safe).
      var early: SessState = null
      evs.foreach { e =>
        val t = e.ts.getTime
        val v = quantizeE6(e.value)
        if (cur == null) cur = SessState(t, t, 1L, v)
        else if (t > cur.lastMs + gapMs) {
          if (early != null) { out ::= closed(userId, early); early = null }
          out ::= closed(userId, cur)
          cur = SessState(t, t, 1L, v)
        } else if (t < cur.startMs - gapMs) {
          if (early == null) early = SessState(t, t, 1L, v)
          else if (t > early.lastMs + gapMs) {
            out ::= closed(userId, early)
            early = SessState(t, t, 1L, v)
          } else early = SessState(early.startMs,
            math.max(early.lastMs, t), early.n + 1, early.totalE6 + v)
        } else {
          cur = SessState(math.min(cur.startMs, t),
            math.max(cur.lastMs, t), cur.n + 1, cur.totalE6 + v)
          // the event may bridge `early` and `cur` into one session
          if (early != null && cur.startMs - early.lastMs <= gapMs) {
            cur = SessState(early.startMs, cur.lastMs,
              cur.n + early.n, cur.totalE6 + early.totalE6)
            early = null
          }
        }
      }
      if (early != null) out ::= closed(userId, early)
      // advance the emitted-span horizon over everything closing now
      if (out.nonEmpty) {
        val m = out.map(_.session_end.getTime).max
        if (m > hor) horizon.update(m)
      }
      // single armed timer per key: re-arm at the new close horizon
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (cur != null) {
        sess.update(cur)
        getHandle.registerTimer(cur.lastMs + gapMs)
      }
      out.reverse.iterator
    }

    override def handleExpiredTimer(userId: Long, tv: ss.TimerValues,
      info: ss.ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!sess.exists()) Iterator.empty
      else {
        val s = sess.get()
        // a stale timer (events arrived after it was registered but
        // its delete raced the expiry) must not close a live session
        if (info.getExpiryTimeInMs() >= s.lastMs + gapMs) {
          sess.clear()
          // no horizon UPDATE needed: a timer fires only once the
          // watermark passed lastMs + gap, so any later arrival
          // inside this span is already a below-watermark drop. But
          // any horizon carried from an earlier eager emission is
          // now below the watermark too (hor < lastMs < wm) — CLEAR
          // it, or a key whose final session closes by timer and
          // never returns would hold its horizon row forever
          // (state must stay bounded by live-ish users, per the
          // handleInputRows comment)
          if (horizon.exists()) horizon.clear()
          Iterator.single(closed(userId, s))
        } else Iterator.empty
      }
    }
  }

  /** Stream-stream interval join — view→click attribution: each
    * click pairs with the SAME user's views from the preceding
    * `maxDelay` window (view_ts ∈ [click_ts − maxDelay, click_ts]).
    * This is the streaming face of j9_asof_join's backward scan,
    * except it keeps EVERY qualifying view, not just the latest.
    *
    * Both inputs carry watermarks and the join condition bounds
    * event-time distance from both directions — the two things Spark
    * needs to compute a state-eviction horizon; without either, join
    * state grows forever. State partitions by user_id (the equi-key),
    * so at 1000 executors this scales like any keyed shuffle.
    *
    * `joinType = "leftOuter"` additionally emits every UNMATCHED click
    * (view columns null) once the watermark passes its join horizon —
    * the "un-attributed conversion" stream a funnel monitor needs;
    * Spark only allows the outer face because both watermarks and the
    * two-sided time bound are present. Clicks are the left side so
    * the preserved rows are the conversions, not the views. */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
    maxDelay: String = "30 minutes", watermark: String = "1 hour",
    joinType: String = "inner")
    : DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
      col("ts").as("view_ts"), col("user_id").as("v_user"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("event_id").as("click_id"),
      col("ts").as("click_ts"), col("user_id").as("c_user"))
      .withWatermark("click_ts", watermark)
    c.join(v, expr(
      s"""v_user = c_user
         |AND view_ts >= click_ts - interval $maxDelay
         |AND view_ts <= click_ts""".stripMargin), joinType)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** File-source stream over a directory of events parquet (schema must
    * be supplied for streaming reads). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema).parquet(dir)
  }
}
