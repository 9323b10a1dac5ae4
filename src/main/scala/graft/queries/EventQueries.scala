package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series operators over `events` — tumbling-window aggregation and
  * gap-based sessionization. These are the batch twins of the Structured
  * Streaming path in [[graft.streaming]]: the same logical windows/session
  * semantics, so batch backfill and live streams agree.
  *
  * Scale: the window agg shuffles once on (window, event_type) — partial
  * aggregation happens map-side; sessionization shuffles once on user_id
  * and sorts within partitions (no global sort).
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  /** money-style exact decimal for order-independent double sums. */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // W2 — tumbling 1-hour windows per event type: counts + exact value sums.
  // null-ts rows are excluded EXPLICITLY on both sides: Spark's window()
  // drops them implicitly (TimeWindowing injects ts IS NOT NULL), and an
  // unstated WHERE in the oracle would otherwise keep a NULL group
  private val w2Tumbling: Q = (s, dir) =>
    Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  private val w2Sql =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // W3 — gap-based sessionization (30-min inactivity ⇒ new session):
  // classic lag + cumulative-sum session assignment, then per-user session
  // stats. Mirrors mapGroupsWithState sessionization in streaming.
  private val w3Sessions: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // integer microseconds on both sides — DuckDB's epoch() is fractional
    val newSession =
      when(unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(byUser) > 1800L * 1000000L, 1)
        .otherwise(0)
    val runningSession = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .withColumn("new_session", newSession)
      .withColumn("session_idx", sum(col("new_session")).over(runningSession))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        floor((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) /
          1000000L).cast("long").as("duration_sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("duration_sec")).as("max_session_sec"))
      .orderBy(col("user_id"))
  }

  private val w3Sql =
    """WITH marked AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
      |      epoch_us(LAG(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) > 1800000000
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events WHERE ts IS NOT NULL),
      |assigned AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM marked),
      |sessions AS (
      |  SELECT user_id, session_idx, COUNT(*) AS n_events,
      |    (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
      |  FROM assigned GROUP BY user_id, session_idx)
      |SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events)::BIGINT AS n_events,
      |  MAX(duration_sec) AS max_session_sec
      |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin

  // W4 — carry-forward window fill: each event carries the most recent
  // 'click' event_id for its user (last non-null over an ordered window) —
  // the columnar twin of the X11 page/section carry in
  // [[graft.ingest.ParentKeys]] (app/parents.py:47-92).
  private val w4CarryForward: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
          .over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("last_click_id"))
      .orderBy(col("event_id"))
  }

  private val w4Sql =
    """SELECT event_id, user_id, event_type,
      |  LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
      |FROM events WHERE ts IS NOT NULL ORDER BY event_id""".stripMargin

  // W7 — semi-structured extraction: pull a typed field out of the JSON
  // `props` column and aggregate on it — the Spark analog of the
  // reference's JSONB `cmetadata->>'key'` filters (docs/ERD.md:85-99,
  // storage/schema.py:98-119). `get_json_object` is codegen'd per row (no
  // UDF); at scale the extracted key would be promoted to a real column at
  // write time exactly as SURVEY §1.3 promotes the reference's hot JSONB
  // keys, making this the query-time fallback path.
  private val w7JsonExtract: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type"), col("value"))
      .withColumn("k_bucket", pmod(col("k"), lit(10L)))
      .groupBy(col("k_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"),
        max(col("k")).as("max_k"))
      .orderBy(col("k_bucket"), col("event_type"))

  private val w7Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY 1, 2 ORDER BY k_bucket, event_type""".stripMargin

  // W11 — cohort retention: users bucketed by their first-active day, and
  // for each (cohort, day-offset) the count of users still active. The
  // per-user cohort day is a WINDOW MIN over the distinct (user, day)
  // activity pairs — so the plan is: one shuffle to dedup activity (pre-
  // combined map-side; the grid is users × days, never event rows), one
  // vocabulary-sized shuffle for the user window, and a tiny final agg.
  // Rows after the dedup are unique (user, day), so COUNT(*) per
  // (cohort, offset) IS the distinct-user count — no second distinct.
  private val w11Cohort: Q = (s, dir) => {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    ud.withColumn("cohort_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long")
          .as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  private val w11Sql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |c AS (
      |  SELECT user_id, day,
      |    MIN(day) OVER (PARTITION BY user_id) AS cohort_day
      |  FROM ud)
      |SELECT cohort_day, datediff('day', cohort_day, day) AS offset_days,
      |  COUNT(*) AS n_users
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // W12 — funnel conversion: users who viewed, then clicked after the
  // first view, then purchased after that click, all within 3 days of the
  // first view. Declared as three chained conditional aggregates — every
  // stage keys on user_id, so the per-user aggregates and both joins
  // reuse ONE hash partitioning (stage outputs are ≤ one row per user,
  // vocabulary-sized); the final counts are one-row broadcasts. The
  // same semantics as a per-user ordered fold, but relational — Catalyst
  // prunes each stage's scan to its event type at the parquet reader.
  private val w12Funnel: Q = (s, dir) => {
    // null-ts events never enter the funnel (stated, not incidental: a
    // user whose only views carry null ts would otherwise count as a
    // view user here but could never advance — and the streaming twin,
    // which drops null-ts rows before its fold, would disagree)
    val ev = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 3 DAYS"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t2"), min(col("t1")).as("vt1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("vt1") + expr("INTERVAL 3 DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_view_users"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click_users"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase_users"))))
  }

  private val w12Sql =
    """WITH v AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL
      |  GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2, MIN(t1) AS vt1
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1
      |    AND CAST(e.ts AS TIMESTAMP) <= t1 + INTERVAL 3 DAY
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2
      |    AND CAST(e.ts AS TIMESTAMP) <= vt1 + INTERVAL 3 DAY
      |  GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
      |  (SELECT COUNT(*) FROM c) AS n_click_users,
      |  (SELECT COUNT(*) FROM p) AS n_purchase_users""".stripMargin

  // W13 — sliding 7-day distinct-user window (DAU / WAU / stickiness).
  // The naive form is a range self-join — every output day re-joined
  // against 7 days of raw events — which re-scans the fact table per day
  // at 100 TB. Declared instead as a bounded explode: each distinct
  // (user, day) activity pair emits its ≤7 covered window-ends, so the
  // fan-out is a constant ×7 on the vocabulary-sized activity grid,
  // never on raw events. The per-(window, user) agg both dedups the
  // fan-out AND folds the active-today flag, so the final DAU/WAU are
  // plain COUNT/SUM over unique rows — no COUNT(DISTINCT) anywhere.
  // Window-ends with no observed activity day are dropped by a broadcast
  // semi-join against the (tiny) observed-day list; stickiness divides
  // two exact longs once (IEEE-identical on both engines).
  private val w13Sliding: Q = (s, dir) => {
    val ud = Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val days = ud.select(col("day").as("wday")).distinct()
    ud.select(col("user_id"), col("day"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"))
      .join(broadcast(days), Seq("wday"), "left_semi")
      .groupBy(col("wday"), col("user_id"))
      .agg(max(when(col("day") === col("wday"), 1).otherwise(0))
        .as("active_today"))
      .groupBy(col("wday"))
      .agg(count(lit(1)).as("wau7"),
        sum(col("active_today")).cast("long").as("dau1"))
      .select(col("wday"), col("dau1"), col("wau7"),
        (col("dau1").cast("double") / col("wau7").cast("double"))
          .as("stickiness"))
      .orderBy(col("wday"))
  }

  private val w13Sql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events WHERE ts IS NOT NULL),
      |days AS (SELECT DISTINCT day AS wday FROM ud)
      |SELECT d.wday,
      |  COUNT(DISTINCT CASE WHEN u.day = d.wday THEN u.user_id END) AS dau1,
      |  COUNT(DISTINCT u.user_id) AS wau7,
      |  COUNT(DISTINCT CASE WHEN u.day = d.wday THEN u.user_id END)::DOUBLE /
      |    COUNT(DISTINCT u.user_id)::DOUBLE AS stickiness
      |FROM days d JOIN ud u ON u.day BETWEEN d.wday - 6 AND d.wday
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // W14 — event-type transition census (the Markov-chain edge table used
  // for next-event modeling): each event pairs with the SAME user's next
  // event by time via one lead window, then (from, to) edges are counted
  // and normalized into transition probabilities. One user_id shuffle
  // powers the window; everything after it lands on the |types|² edge
  // vocabulary, so the census and the per-source normalization window
  // are broadcast-sized. The probability divides two exact longs once.
  private val w14Transitions: Q = (s, dir) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("ts").isNotNull)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type")))
          .cast("double"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val w14Sql =
    """WITH nx AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      |  FROM events WHERE ts IS NOT NULL),
      |edges AS (
      |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      |  FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  n::DOUBLE / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM edges ORDER BY from_type, to_type""".stripMargin

  val defs: Map[String, Q] = Map(
    "w13_sliding_active" -> w13Sliding,
    "w14_transitions" -> w14Transitions,
    "w2_tumbling_window" -> w2Tumbling,
    "w3_sessionization" -> w3Sessions,
    "w4_carry_forward" -> w4CarryForward,
    "w7_json_extract" -> w7JsonExtract,
    "w11_cohort_retention" -> w11Cohort,
    "w12_funnel" -> w12Funnel)

  val oracles: Map[String, String] = Map(
    "w13_sliding_active" -> w13Sql,
    "w14_transitions" -> w14Sql,
    "w2_tumbling_window" -> w2Sql,
    "w3_sessionization" -> w3Sql,
    "w4_carry_forward" -> w4Sql,
    "w7_json_extract" -> w7Sql,
    "w11_cohort_retention" -> w11Sql,
    "w12_funnel" -> w12Sql)
}
