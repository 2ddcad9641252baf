package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time windowing over the `events` table — the batch faces of
  * the streaming operators in graft.streaming (SURVEY §2.10: the
  * reference has no event-time at all; this is north-star coverage).
  *
  * Oracle parity notes: events.parquet is TIMESTAMP(NANOS); both
  * engines truncate ns→µs (Tables.loadEvents uses integer div, DuckDB
  * stores µs), so `ts` is identical. Window starts are compared as
  * formatted strings; Spark tumbling windows and DuckDB time_bucket
  * both align hour buckets to hour boundaries.
  *
  * Scale: tumbling/sliding aggregation is one partial+final hash agg
  * (map-side combine) — the shuffle carries (bucket, type) pairs, not
  * events. Sessionization is a single per-user sort (one shuffle on
  * user_id) + lag/cumsum — the classic distributed sessionize.
  */
object EventTimeQueries {
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-hour window counts per event type.
    "t1_tumbling_window" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("cnt"))
        .orderBy("ws", "event_type")),

    // Sliding 2-hour window (1-hour slide): each event lands in 2 windows.
    "t2_sliding_window" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"))
        .agg(count(lit(1)).as("cnt"))
        .select(
          date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("cnt"))
        .orderBy("ws")),

    // Sessionization: 30-minute inactivity gap per user (batch analog of
    // session_window / mapGroupsWithState).
    "t3_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      ev(s, dir)
        .filter(col("user_id") < 20)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"))
        .agg(max("sess_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // As-of join: each click enriched with the most recent view value
    // at-or-before it for the same user (AsofJoin's union-scan plan —
    // one shuffle, no pair blowup; oracle = DuckDB's native ASOF JOIN).
    // The view side is pre-aggregated per (user, ts) so equal-time
    // duplicates cannot make the match ambiguous in either engine.
    "j9_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select(col("event_id"), col("user_id"), col("ts"))
      // user_id < 50 on the RIGHT side too: AsofJoin union-scans both
      // sides through one shuffle+sort, and views from users with no
      // left row would ride that shuffle only to be discarded
      val views = e.filter(col("event_type") === "view" &&
          col("user_id") < 50)
        .groupBy(col("user_id"), col("ts")).agg(max("value").as("v"))
      AsofJoin.backward(clicks, views, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
          floor(col("v") * lit(10000d) + lit(0.5d)).cast("long")
            .as("v_e4"))
        .orderBy("event_id")
    }),

    // Forward as-of join — j9's mirror: each view enriched with the
    // NEXT click value at-or-after it for the same user ("time to
    // next conversion"). Same union-scan plan, opposite direction;
    // oracle = DuckDB's native ASOF with the <= inequality.
    "j14_asof_forward" -> ((s, dir) => {
      val e = ev(s, dir)
      val views = e
        .filter(col("event_type") === "view" && col("user_id") < 50)
        .select(col("event_id"), col("user_id"), col("ts"))
      // right-side user filter, as in j9 — drop never-matching rows
      // before the union-scan shuffle
      val clicks = e.filter(col("event_type") === "click" &&
          col("user_id") < 50)
        .groupBy(col("user_id"), col("ts")).agg(max("value").as("v"))
      AsofJoin.forward(views, clicks, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
          floor(col("v") * lit(10000d) + lit(0.5d)).cast("long")
            .as("v_e4"))
        .orderBy("event_id")
    }),

    // Funnel-path mining: each user's first three event types in
    // time order, joined into a '>'-separated path, counted per
    // distinct path — the onboarding-funnel census. Plan: ONE
    // shuffle on user_id for the row_number window, then the path
    // frame is user-cardinality-sized and the final agg is over at
    // most |types|^3 paths. collect_list order is pinned by sorting
    // the (rn, type) structs — never relied on shuffle order.
    "t4_funnel_paths" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("rn", row_number().over(byUser))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"),
            col("event_type").as("t")))),
          x => x("t")), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("path")
    }),

    // First-order Markov transition counts between event types, per
    // user timeline — the behavior-model / anomaly-baseline census.
    // One user-keyed window (lag) + one map-side-combined count;
    // ties on ts broken by event_id so the sequence is total and
    // both engines walk the identical order.
    "t8_transition_matrix" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("prev", "event_type")
    }),

    // Retention cohort matrix: users grouped by FIRST-active week
    // (the cohort), counted per weeks-since-cohort offset — the
    // product-analytics staple ("of the week-N signups, how many
    // came back in week N+k"). Shapes: one distinct over (user,
    // week), one per-user min, one keyed join + count — every
    // shuffle on user_id or the small (cohort, offset) pair; no
    // window, no day-grid expansion.
    "t7_retention_cohorts" -> ((s, dir) => {
      // deterministic per-user event subset: the raw synthetic data
      // has every user active every week (a flat, single-cohort
      // matrix); this slice staggers first-activity weeks so the
      // cohort triangle is real and decaying
      val uw = ev(s, dir)
        .filter(pmod(col("event_id"), lit(17)) ===
          pmod(col("user_id"), lit(17)))
        .select(col("user_id"),
          expr("cast(datediff(cast(ts as date), date'1970-01-01') " +
            "as bigint) div 7").as("wk"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min("wk").as("cw"))
      uw.join(cohort, "user_id")
        .groupBy(col("cw").as("cohort_week"),
          (col("wk") - col("cw")).as("week_offset"))
        .agg(count(lit(1)).as("n_users")) // (user, wk) is distinct
        .orderBy("cohort_week", "week_offset")
    }),

    // Rolling 7-day distinct users per day (the WAU curve), spelled
    // as a BOUNDED inverted-index explode — an event on day e
    // supports the windows ending on e..e+6, so each event emits ≤ 7
    // (window, user) rows and the count is one partial-distinct agg;
    // the window-over-sets spelling has no distributable form, and a
    // per-day range self-join would rescan the corpus per day. Exact
    // distinct, clamped to the observed day range.
    "t6_weekly_active" -> ((s, dir) => {
      val evd = ev(s, dir).select(col("user_id"),
        datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d"))
      val bounds = evd.agg(max("d").as("mx"))
      evd.crossJoin(bounds)
        .withColumn("wd", explode(sequence(col("d"),
          least(col("d") + 6, col("mx")))))
        .groupBy(col("wd"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy("wd")
    }),

    // Resample + forward-fill: each user's event stream regularized
    // onto a dense hourly grid between their first and last events —
    // missing hours appear with cnt 0 and the last observed hourly
    // value carried forward (the gap-filling step before any
    // fixed-step time-series model). Values quantize to integer e4
    // per EVENT before summing, so hourly sums are order-free. The
    // grid generation is per-user sequence() — no driver range, no
    // global calendar table; the ffill is a per-user running
    // last-non-null window (one keyed shuffle).
    "t5_resample_ffill" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 10000 + 0.5).cast("long"))
            .as("v_e4"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min("h").as("mn"), max("h").as("mx"))
        .select(col("user_id"), explode(sequence(col("mn"), col("mx"),
          expr("interval 1 hour"))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hs"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          last(col("v_e4"), ignoreNulls = true).over(w)
            .as("v_ffill_e4"))
        .orderBy("user_id", "hs")
    })
  )

  val oracle: Map[String, String] = Map(
    "t1_tumbling_window" -> """
      |SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
      |   '%Y-%m-%d %H:%M:%S') AS ws,
      | event_type, count(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t2_sliding_window" -> """
      |WITH w AS (SELECT unnest([
      |  time_bucket(INTERVAL '1 hour', ts),
      |  time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS ws
      | FROM events)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, count(*) AS cnt
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "t3_sessionize" -> """
      |WITH e AS (SELECT user_id, ts,
      |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
      |   AS prev_us
      | FROM events WHERE user_id < 20),
      |m AS (SELECT user_id, ts,
      |  CASE WHEN prev_us IS NULL
      |   OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END
      |   AS new_sess FROM e),
      |sx AS (SELECT user_id,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      | FROM m)
      |SELECT user_id, max(sess_id)::BIGINT AS n_sessions,
      | count(*) AS n_events
      |FROM sx GROUP BY 1 ORDER BY 1""".stripMargin,
    "j9_asof_join" -> """
      |WITH l AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'click' AND user_id < 50),
      |r AS (SELECT user_id, ts, max(value) AS v FROM events
      |  WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id,
      | strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS t,
      | CAST(floor(r.v * 10000 + 0.5) AS BIGINT) AS v_e4
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY event_id""".stripMargin,
    "j14_asof_forward" -> """
      |WITH l AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view' AND user_id < 50),
      |r AS (SELECT user_id, ts, max(value) AS v FROM events
      |  WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id,
      | strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS t,
      | CAST(floor(r.v * 10000 + 0.5) AS BIGINT) AS v_e4
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts
      |ORDER BY event_id""".stripMargin,
    "t4_funnel_paths" -> """
      |WITH ranked AS (SELECT user_id, event_type,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS rn
      | FROM events),
      |p AS (SELECT user_id,
      |  string_agg(event_type, '>' ORDER BY rn) AS path
      | FROM ranked WHERE rn <= 3 GROUP BY user_id)
      |SELECT path, count(*) AS n_users
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "t6_weekly_active" -> """
      |WITH ev AS (SELECT user_id,
      |  date_diff('day', DATE '1970-01-01', ts::DATE) AS d
      | FROM events),
      |mx AS (SELECT max(d) AS m FROM ev),
      |w AS (SELECT user_id, unnest(range(d,
      |  least(d + 6, (SELECT m FROM mx)) + 1)) AS wd FROM ev)
      |SELECT wd, count(DISTINCT user_id) AS wau
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "t8_transition_matrix" -> """
      |WITH t AS (SELECT event_type,
      |  lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev
      | FROM events)
      |SELECT prev, event_type, count(*)::BIGINT AS cnt
      |FROM t WHERE prev IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t7_retention_cohorts" -> """
      |WITH uw AS (SELECT DISTINCT user_id,
      |  date_diff('day', DATE '1970-01-01', ts::DATE) // 7 AS wk
      | FROM events WHERE event_id % 17 = user_id % 17),
      |c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
      |SELECT c.cw AS cohort_week, uw.wk - c.cw AS week_offset,
      | count(*)::BIGINT AS n_users
      |FROM uw JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t5_resample_ffill" -> """
      |WITH hourly AS (SELECT user_id,
      |  time_bucket(INTERVAL '1 hour', ts) AS h,
      |  count(*) AS cnt,
      |  sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))::BIGINT
      |   AS v_e4
      | FROM events WHERE user_id < 10 GROUP BY 1, 2),
      |b AS (SELECT user_id, min(h) AS mn, max(h) AS mx
      |      FROM hourly GROUP BY 1),
      |grid AS (SELECT user_id,
      |  unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS h
      | FROM b),
      |f AS (SELECT g.user_id, g.h,
      |  coalesce(hourly.cnt, 0)::BIGINT AS cnt,
      |  last_value(hourly.v_e4 IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   AS v_ffill_e4
      | FROM grid g LEFT JOIN hourly
      |  ON g.user_id = hourly.user_id AND g.h = hourly.h)
      |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hs,
      | cnt, v_ffill_e4
      |FROM f ORDER BY 1, 2""".stripMargin
  )
}
