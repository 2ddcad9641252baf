package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long, typ: String,
    v: Double = 1.0) = Event(id, ts(t), user, typ, v, "{}")

  test("tumbling window counts with watermark (update mode)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(
        ev(1, "2026-01-01 10:05:00", 1, "click"),
        ev(2, "2026-01-01 10:45:00", 1, "click"),
        ev(3, "2026-01-01 11:05:00", 2, "view"))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .collect().map(r => (r.getTimestamp(0).toString,
          r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2026-01-01 10:00:00.0", "click", 2L)))
      assert(rows.contains(("2026-01-01 11:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within watermark") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ev(1, "2026-01-01 10:00:00", 1, "click"),
        ev(1, "2026-01-01 10:00:30", 1, "click"),
        ev(2, "2026-01-01 10:01:00", 1, "view"))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals accumulate across batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2026-01-01 10:00:00", 7, "click", 2.0),
        ev(2, "2026-01-01 10:01:00", 7, "click", 3.0))
      q.processAllAvailable()
      in.addData(ev(3, "2026-01-01 10:02:00", 7, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("running").as[EventStreams.UserAgg]
        .collect().sortBy(_.n_events)
      assert(rows.map(r => (r.n_events, r.total_value)).toSeq ==
        Seq((2L, 5.0), (3L, 10.0)))
    } finally q.stop()
  }

  test("session windows split on 30-minute gaps") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionCounts(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(
        ev(1, "2026-01-01 10:00:00", 1, "a"),
        ev(2, "2026-01-01 10:10:00", 1, "a"),   // same session
        ev(3, "2026-01-01 11:30:00", 1, "a"))   // new session
      q.processAllAvailable()
      val sessions = spark.table("sessions").collect()
      assert(sessions.length == 2)
      assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq ==
        Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream attribution join bounds matches by user and time") {
    implicit val sql = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.attributionJoin(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        ev(10, "2026-01-01 10:00:00", 1, "view"),  // in window
        ev(11, "2026-01-01 09:00:00", 1, "view"),  // too old
        ev(12, "2026-01-01 10:30:00", 1, "view"),  // AFTER the click
        ev(13, "2026-01-01 10:05:00", 2, "view"))  // other user
      clicks.addData(
        ev(20, "2026-01-01 10:15:00", 1, "click"))
      q.processAllAvailable()
      // advance both watermarks past the join horizon so the joined
      // rows are emitted in append mode
      views.addData(ev(14, "2026-01-01 13:00:00", 9, "view"))
      clicks.addData(ev(21, "2026-01-01 13:00:00", 9, "click"))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .collect().map(r => (r.getAs[Long]("click_id"),
          r.getAs[Long]("view_id"))).toSet
      // click 20 matches ONLY view 10; the 13:00 pair also self-joins
      assert(got.contains((20L, 10L)))
      assert(!got.contains((20L, 11L)) && !got.contains((20L, 12L))
        && !got.contains((20L, 13L)))
    } finally q.stop()
  }

  test("leftOuter attribution emits unmatched clicks after the horizon") {
    implicit val sql = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.attributionJoin(views.toDF(), clicks.toDF(),
      joinType = "leftOuter")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(ev(10, "2026-01-01 10:00:00", 1, "view"))
      clicks.addData(
        ev(20, "2026-01-01 10:15:00", 1, "click"),  // attributed
        ev(21, "2026-01-01 10:15:00", 2, "click"))  // no view → null
      q.processAllAvailable()
      // push both watermarks far past click 21's join horizon so the
      // outer row is released from state
      views.addData(ev(14, "2026-01-01 15:00:00", 9, "view"))
      clicks.addData(ev(22, "2026-01-01 15:00:00", 9, "click"))
      q.processAllAvailable()
      val got = spark.table("attrib_outer")
        .collect().map(r => (r.getAs[Long]("click_id"),
          Option(r.getAs[Any]("view_id")))).toSet
      assert(got.contains((20L, Some(10L))), s"got $got")
      assert(got.contains((21L, None)),
        s"unmatched click not emitted with null view: $got")
    } finally q.stop()
  }

  test("leaderboard at 1e5 groups: 1 state row/group, k-bounded, checkpoint replay") {
    // the scale contract its batch twin proves under spill (round-12
    // ask #8): state must stay ONE store row per group holding ≤ k
    // entries, and a restart from the checkpoint must resume with
    // every board intact — verified by a post-restart score that only
    // ranks correctly if the pre-restart state survived.
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val ckpt = java.nio.file.Files
      .createTempDirectory("board_scale_ckpt").toString
    val n = 100000
    val board = EventStreams.leaderboard(in.toDS(), k = 2)
    // foreachBatch, not the memory sink: only fault-tolerant sinks may
    // recover from a checkpoint, and the restart leg below is the point
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Long, Long)]
    def start() = board.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[EventStreams.LeaderEntry],
          _: Long) =>
          val rows = df.collect()
            .map(e => (e.event_type, e.rank, e.user_id, e.best_e6))
          got.synchronized { got ++= rows }; ()
      }.start()
    val q1 = start()
    try {
      in.addData((0 until n).flatMap { g =>
        Seq(ev(g * 2L, "2026-01-01 10:00:00", 1, s"g$g", (g % 50) + 2.0),
          ev(g * 2L + 1, "2026-01-01 10:00:01", 2, s"g$g", (g % 50) + 1.0))
      })
      q1.processAllAvailable()
      // state store: exactly one row per live group — k·groups
      // ENTRIES live inside the per-group BoardState, never more
      val st = q1.lastProgress.stateOperators
      assert(st.nonEmpty && st.head.numRowsTotal == n.toLong,
        st.map(_.numRowsTotal).mkString(","))
      got.synchronized {
        assert(got.size == 2 * n, got.size)
        assert(got.iterator.map(_._2).max <= 2)
      }
    } finally q1.stop()
    // restart from the checkpoint: user 3 scores ABOVE g0's two
    // resident entries (u1=2.0, u2=1.0) but below 3.0 — the emitted
    // board is (u3 2.5, u1 2.0) ONLY if the pre-restart state
    // replayed exactly (a cold board would emit u3 alone at rank 1)
    got.synchronized(got.clear())
    val q2 = start()
    try {
      in.addData(ev(999999999L, "2026-01-01 11:00:00", 3, "g0", 2.5))
      q2.processAllAvailable()
      val after = got.synchronized(got.toSet)
      assert(after == Set(("g0", 1, 3L, 2500000L),
        ("g0", 2, 1L, 2000000L)),
        s"checkpoint state not replayed: $after")
      // and the store still holds every group, not just the touched one
      assert(q2.lastProgress.stateOperators.head.numRowsTotal == n.toLong)
    } finally q2.stop()
  }

  test("transformWithState sessionization: timers close quiet sessions") {
    // the capability session_window can't express: u1's session must
    // EMIT when the watermark passes lastEvent + gap — no further u1
    // event exists to flush it. Requires the RocksDB provider (a
    // transformWithState constraint); restore the default after.
    implicit val sql = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Event]
    val q = EventStreams
      .sessionizeWithTimers(in.toDS(), gapMs = 30 * 60 * 1000L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // u1: two events 10 min apart (one session); the SAME batch also
      // carries a u2 pair 45 min apart — that splits IN-BATCH and the
      // first u2 session emits immediately, no timer needed
      in.addData(
        ev(1, "2026-01-01 10:00:00", 1, "a", 2.0),
        ev(2, "2026-01-01 10:10:00", 1, "a", 3.0),
        ev(3, "2026-01-01 10:00:00", 2, "a", 1.0),
        ev(4, "2026-01-01 10:45:00", 2, "a", 1.0))
      q.processAllAvailable()
      val early = spark.table("tws_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getLong(4))).toSet
      assert(early == Set((2L, "2026-01-01 10:00:00.0",
        "2026-01-01 10:00:00.0", 1L, 1000000L)),
        s"in-batch split should emit exactly u2's first session: $early")
      // advance the watermark past u1's horizon (10:10 + 30min gap +
      // 10min delay → any event past 10:50+10min); two batches: one
      // to carry the event, one so the new watermark drives timers
      in.addData(ev(5, "2026-01-01 12:00:00", 9, "a", 1.0))
      q.processAllAvailable()
      in.addData(ev(6, "2026-01-01 12:00:01", 9, "a", 1.0))
      q.processAllAvailable()
      val after = spark.table("tws_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getLong(4))).toSet
      assert(after.contains((1L, "2026-01-01 10:00:00.0",
        "2026-01-01 10:10:00.0", 2L, 5000000L)),
        s"u1's quiet session not closed by its timer: $after")
      assert(after.contains((2L, "2026-01-01 10:45:00.0",
        "2026-01-01 10:45:00.0", 1L, 1000000L)),
        s"u2's second session not closed by its timer: $after")
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }

  test("sessionization: out-of-order predecessor splits backwards; " +
    "below-watermark rows drop") {
    // Two late/out-of-order contracts (EventStreams doc): (1) an
    // in-watermark event preceding the open session by > gap forms
    // its OWN earlier session instead of stretching session_start
    // back; (2) a below-watermark event is dropped, never re-opening
    // a timer-closed session as a phantom. Needs watermark delay >
    // gap so (1) is reachable: gap 10 min, delay 2 h.
    implicit val sql = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Event]
    val q = EventStreams
      .sessionizeWithTimers(in.toDS(), gapMs = 10 * 60 * 1000L,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("tws_ooo")
      .outputMode(OutputMode.Append).start()
    def emitted: Set[(Long, String, String, Long)] =
      spark.table("tws_ooo").collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3))).toSet
    try {
      // batch 1: u1 opens a session at 12:00 (watermark → 10:00)
      in.addData(ev(1, "2026-01-01 12:00:00", 1, "a"))
      q.processAllAvailable()
      // batch 2: two in-watermark events PRECEDING 12:00 by > gap;
      // they chain with each other (5 min apart) into one earlier
      // session, emitted at batch end — the open 12:00 session must
      // NOT absorb them (that would start it at 11:00)
      in.addData(ev(2, "2026-01-01 11:00:00", 1, "a"),
        ev(3, "2026-01-01 11:05:00", 1, "a"))
      q.processAllAvailable()
      assert(emitted == Set((1L, "2026-01-01 11:00:00.0",
        "2026-01-01 11:05:00.0", 2L)),
        s"backward events must form their own session: $emitted")
      // advance the watermark (15:00 → 13:00) and drive timers with a
      // follow-up batch: the 12:00 session closes untouched
      in.addData(ev(4, "2026-01-01 15:00:00", 9, "a"))
      q.processAllAvailable()
      in.addData(ev(5, "2026-01-01 15:00:01", 9, "a"))
      q.processAllAvailable()
      assert(emitted.contains((1L, "2026-01-01 12:00:00.0",
        "2026-01-01 12:00:00.0", 1L)),
        s"open session corrupted by the backward split: $emitted")
      // below-watermark (13:00): u1 at 12:30 must be DROPPED — no
      // phantom session may ever surface for it
      in.addData(ev(6, "2026-01-01 12:30:00", 1, "a"))
      q.processAllAvailable()
      in.addData(ev(7, "2026-01-01 18:00:00", 9, "a"),
        ev(8, "2026-01-01 18:00:01", 9, "a"))
      q.processAllAvailable()
      in.addData(ev(9, "2026-01-01 23:00:00", 9, "a"))
      q.processAllAvailable()
      val phantom = emitted.filter(s => s._1 == 1L &&
        s._2.startsWith("2026-01-01 12:30"))
      assert(phantom.isEmpty,
        s"below-watermark event re-opened a closed session: $emitted")
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }

  test("sessionization: emitted spans stay disjoint — a later-batch " +
    "predecessor inside an emitted span drops, outside it splits") {
    // Disjointness contract (EventStreams doc): early sessions emit
    // eagerly at batch end, BEFORE the watermark passes them, so an
    // in-watermark predecessor arriving in a LATER batch could land
    // INSIDE the emitted span — the per-key horizon must drop it
    // (emitting (11:03,11:03) after (11:00,11:05) would hand
    // consumers overlapping Append rows). An arrival AFTER the
    // horizon still gets its own early session — the horizon must
    // not over-drop.
    implicit val sql = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Event]
    val q = EventStreams
      .sessionizeWithTimers(in.toDS(), gapMs = 10 * 60 * 1000L,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("tws_disjoint")
      .outputMode(OutputMode.Append).start()
    def emitted: Seq[(Long, Long, Long)] =
      spark.table("tws_disjoint").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime)).toSeq
    try {
      // batch 1: u1 opens at 12:00 (watermark → 10:00)
      in.addData(ev(1, "2026-01-01 12:00:00", 1, "a"))
      q.processAllAvailable()
      // batch 2: early session (11:00, 11:05) emits at batch end
      in.addData(ev(2, "2026-01-01 11:00:00", 1, "a"),
        ev(3, "2026-01-01 11:05:00", 1, "a"))
      q.processAllAvailable()
      // batch 3: 11:03 falls INSIDE the emitted span → dropped;
      // 11:20 falls after it (and > gap before the open 12:00) →
      // its own early session
      in.addData(ev(4, "2026-01-01 11:03:00", 1, "a"),
        ev(5, "2026-01-01 11:20:00", 1, "a"))
      q.processAllAvailable()
      val u1 = emitted.filter(_._1 == 1L)
      val t1103 = java.sql.Timestamp.valueOf("2026-01-01 11:03:00")
      assert(!u1.exists(s => s._2 == t1103.getTime),
        s"predecessor inside an emitted span must drop: $u1")
      val t1120 = java.sql.Timestamp.valueOf("2026-01-01 11:20:00")
      assert(u1.exists(s => s._2 == t1120.getTime &&
        s._3 == t1120.getTime),
        s"post-horizon predecessor should split into its own: $u1")
      // batch 4: the documented CONSERVATIVE drop — 11:10 overlaps
      // neither emitted span ((11:00,11:05), (11:20,11:20)) but sits
      // at or before the max emitted end, so the single-Long horizon
      // drops it rather than risk a later arrival bridging ACROSS an
      // emitted span (EventStreams doc)
      in.addData(ev(6, "2026-01-01 11:10:00", 1, "a"))
      q.processAllAvailable()
      val u1b = emitted.filter(_._1 == 1L)
      val t1110 = java.sql.Timestamp.valueOf("2026-01-01 11:10:00")
      assert(!u1b.exists(s => s._2 == t1110.getTime),
        s"gap event before the horizon must drop (conservative " +
          s"contract): $u1b")
      // the contract itself: pairwise-disjoint spans for u1
      val overlaps = u1b.combinations(2).filter { case Seq(a, b) =>
        a._2 <= b._3 && b._2 <= a._3 }
      assert(overlaps.isEmpty,
        s"overlapping emitted sessions: ${overlaps.toList} in $u1b")
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(providerKey))(
        spark.conf.set(providerKey, _))
    }
  }

  test("streaming leaderboard keeps the k best per group across batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.leaderboard(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("board")
      .outputMode(OutputMode.Append).start()
    def lastBoards: Map[(String, Int), (Long, Long)] =
      // memory sink in append mode accumulates every emission; the
      // CURRENT board per (group, rank) is the latest — reconstruct
      // by replay order via monotonically increasing row position
      spark.table("board").collect().foldLeft(
        Map.empty[(String, Int), (Long, Long)]) { (m, r) =>
        m.updated((r.getString(0), r.getInt(1)),
          (r.getLong(2), r.getLong(3)))
      }
    try {
      in.addData(
        ev(1, "2026-01-01 10:00:00", 1, "game", 5.0),
        ev(2, "2026-01-01 10:00:01", 2, "game", 9.0),
        ev(3, "2026-01-01 10:00:02", 3, "game", 7.0),
        ev(4, "2026-01-01 10:00:03", 8, "quiz", 1.0))
      q.processAllAvailable()
      val b1 = lastBoards
      assert(b1(("game", 1)) == ((2L, 9000000L)), b1)
      assert(b1(("game", 2)) == ((3L, 7000000L)), b1)
      assert(b1(("quiz", 1)) == ((8L, 1000000L)), b1)
      val afterB1 = spark.table("board").count()
      // batch 2: user 1 re-enters by beating the k-th (7.0); quiz
      // untouched — must not re-emit
      in.addData(ev(5, "2026-01-01 10:05:00", 1, "game", 8.0))
      q.processAllAvailable()
      val b2 = lastBoards
      assert(b2(("game", 1)) == ((2L, 9000000L)), b2)
      assert(b2(("game", 2)) == ((1L, 8000000L)), b2)
      val gameRows = spark.table("board").count()
      assert(gameRows == afterB1 + 2,
        s"untouched quiz group re-emitted: $afterB1 -> $gameRows")
      // batch 3: a user already on the board keeps their BEST (a
      // lower new score must not demote user 2)
      in.addData(ev(6, "2026-01-01 10:10:00", 2, "game", 3.0))
      q.processAllAvailable()
      val b3 = lastBoards
      assert(b3(("game", 1)) == ((2L, 9000000L)), b3)
      assert(b3(("game", 2)) == ((1L, 8000000L)), b3)
    } finally q.stop()
  }
}
