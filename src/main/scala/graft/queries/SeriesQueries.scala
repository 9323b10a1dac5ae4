package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 catalog extensions, part 3 — time-series densification
  * (gap-fill resampling), higher-order array functions over the embedding
  * column, exact mode, fixed-grid histograms, and edit-distance fuzzy
  * matching (probe top-k + blocked pair join). Every query carries an exact
  * DuckDB oracle.
  */
object SeriesQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- W10: gap-fill resample — daily event counts per user with
  // zero-filled missing days between that user's first and last active
  // day. The calendar is generated per user with `sequence` + `explode`
  // (bounded by the span, never a global cross join) and left-joined back
  // to the observed counts. One shuffle on user_id covers the daily agg
  // and the span agg; the calendar join re-uses the same partitioning. At
  // 100 TB the explode fan-out is (active span in days) per user — data-
  // bounded, not table-bounded, which is what makes this survive scale.
  private val w10Gapfill: Q = (s, dir) => {
    val daily = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val calendar = daily
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id").as("cal_user"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("cal_day"))
    calendar
      .join(daily, col("cal_user") === col("user_id") &&
        col("cal_day") === col("day"), "left")
      .select(col("cal_user").as("user_id"), col("cal_day").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("user_id"), col("day"))
  }

  private val w10Sql =
    """WITH daily AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |cal AS (
      |  SELECT user_id AS cal_user,
      |    CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS cal_day
      |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |        FROM daily GROUP BY 1))
      |SELECT cal_user AS user_id, cal_day AS day,
      |  COALESCE(n_events, 0) AS n_events
      |FROM cal LEFT JOIN daily
      |  ON cal_user = daily.user_id AND cal_day = daily.day
      |ORDER BY 1, 2""".stripMargin

  // ---- F2: higher-order array functions over the embedding column —
  // length, min/max element, positive count (lambda filter), and argmax
  // (1-based, first occurrence on both engines). All codegen'd built-ins,
  // no UDF: the scan stays inside one WholeStageCodegen span and the only
  // movement is the final order. Float → double casts are exact widenings,
  // so the oracle compare is bit-exact.
  private val f2ArrayStats: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        array_min(col("embedding")).cast("double").as("min_val"),
        array_max(col("embedding")).cast("double").as("max_val"),
        size(filter(col("embedding"), x => x > lit(0.0f))).cast("long")
          .as("n_pos"),
        array_position(col("embedding"), array_max(col("embedding")))
          .cast("long").as("argmax"))
      .orderBy(col("vec_id"))

  private val f2Sql =
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  CAST(list_min(embedding) AS DOUBLE) AS min_val,
      |  CAST(list_max(embedding) AS DOUBLE) AS max_val,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |  CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
      |    AS argmax
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- A18: exact mode with a deterministic tie-break — most frequent
  // quantity per return flag, lowest quantity winning ties. Built-in
  // mode() leaves ties unspecified on BOTH engines, so the query states
  // the tie order explicitly: count per (flag, qty), then a rank window.
  // Two cheap shuffles ((flag,qty) agg is pre-combined map-side; the
  // window input is one row per distinct pair, not per lineitem row).
  private val a18Mode: Q = (s, dir) => {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_quantity").asc)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("n").as("mode_n"))
      .orderBy(col("l_returnflag"))
  }

  private val a18Sql =
    """SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n
      |FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS n
      |      FROM lineitem GROUP BY 1, 2)
      |QUALIFY row_number() OVER (PARTITION BY l_returnflag
      |  ORDER BY n DESC, l_quantity ASC) = 1
      |ORDER BY l_returnflag""".stripMargin

  // ---- A19: fixed-grid histogram of order values — 20 buckets of 25k.
  // The bucket id is plain arithmetic (floor(x / 25000.0) clamped to the
  // last bucket), identical IEEE ops on both engines, computed map-side so
  // the shuffle carries ≤20 pre-combined rows per partition. min/max per
  // bucket are exact (no summation). This is the scalable histogram shape:
  // a fixed grid needs one pass and no data-dependent bucket boundaries.
  private val a19Histogram: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_totalprice"),
        least(floor(col("o_totalprice") / 25000.0), lit(19)).cast("long")
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo_price"),
        max(col("o_totalprice")).as("hi_price"))
      .orderBy(col("bucket"))

  private val a19Sql =
    """SELECT CAST(least(floor(o_totalprice / 25000.0), 19) AS BIGINT)
      |    AS bucket,
      |  COUNT(*) AS n, MIN(o_totalprice) AS lo_price,
      |  MAX(o_totalprice) AS hi_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- X11: fuzzy probe match — the 20 part names closest to a typo'd
  // probe by Levenshtein distance (classic edit distance, identical
  // definition on both engines), key tie-break. Plans as
  // TakeOrderedAndProject: each partition keeps its local top-20, the
  // driver merges — no global sort at any scale.
  private val x11FuzzyProbe: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"),
        levenshtein(col("p_name"), lit("smal ring")).cast("long").as("dist"))
      .orderBy(col("dist").asc, col("p_partkey").asc)
      .limit(20)

  private val x11Sql =
    """SELECT p_partkey, p_name,
      |  CAST(levenshtein(p_name, 'smal ring') AS BIGINT) AS dist
      |FROM part ORDER BY dist ASC, p_partkey ASC LIMIT 20""".stripMargin

  // ---- X12: blocked fuzzy pair join — near-duplicate part names found by
  // blocking on the last token (the noun) and comparing edit distance only
  // within a block. This is the scalable fuzzy-dedup pattern: the O(n²)
  // comparison collapses to O(Σ block²) after an equi-join on the block
  // key, exactly like d3's LSH band buckets. Distinct names first (64 here;
  // bounded by the name vocabulary, not the row count), so the pair join
  // runs on the vocabulary.
  private val x12FuzzyPairs: Q = (s, dir) => {
    val names = Tables.part(s, dir)
      .select(col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("block"))
      .distinct()
    val a = names.select(col("p_name").as("name_a"), col("block"))
    val b = names.select(col("p_name").as("name_b"),
      col("block").as("block_b"))
    a.join(b, col("block") === col("block_b") &&
        col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .filter(col("dist") <= 3)
      .orderBy(col("name_a"), col("name_b"))
  }

  private val x12Sql =
    """WITH names AS (
      |  SELECT DISTINCT p_name,
      |    string_split(p_name, ' ')[-1] AS block
      |  FROM part)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM names a JOIN names b
      |  ON a.block = b.block AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a, name_b""".stripMargin

  // ---- W15: z-score anomaly census per event type — the streaming-
  // telemetry outlier gate, in the a17 exact-power-sum form so the score
  // is bit-identical across engines. Values scale to BIGINT cents; per
  // type the census is (n, Σv BIGINT, Σv² DECIMAL↔HUGEINT) — plain
  // partial+final hash aggregates, partitioning-independent. The tiny
  // per-type stats broadcast back (vocabulary-sized — never a window
  // over the event stream) and z = (n·v − Σv)/√(n·Σv² − (Σv)²) is one
  // fixed IEEE sequence over exactly-rounded casts; a zero/negative
  // discriminant (all-equal values; double-rounded, but identically so
  // on both engines) defines z = 0. Output ints exact; max|z| is a max
  // over identical doubles.
  private val w15Anomaly: Q = (s, dir) => {
    val v = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), v.as("v"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        // widen BEFORE multiplying: v·v in 64-bit overflows (ANSI abort)
        // at |value| ≈ $30.4M — a telemetry domain has no a17-style
        // price bound, so the per-row product must already be decimal
        sum(col("v").cast("decimal(30,0)") * col("v")).as("s2"))
    val nD = col("n").cast("double")
    val vD = col("v").cast("double")
    val s1D = col("s1").cast("double")
    val s2D = col("s2").cast("double")
    val disc = nD * s2D - s1D * s1D
    val z = when(disc <= 0.0, lit(0.0))
      .otherwise((nD * vD - s1D) / sqrt(disc))
    ev.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), z.as("z"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_anomalies"),
        max(abs(col("z"))).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  private val w15Sql =
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |stats AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(v) AS s1,
      |    SUM(CAST(v AS HUGEINT) * v) AS s2
      |  FROM ev GROUP BY 1),
      |scored AS (
      |  SELECT ev.event_type,
      |    CASE WHEN CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) <= 0.0 THEN 0.0
      |         ELSE (CAST(n AS DOUBLE) * CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE))
      |           / sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) END AS z
      |  FROM ev JOIN stats USING (event_type))
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_anomalies,
      |  MAX(abs(z)) AS max_abs_z
      |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin

  val defs: Map[String, Q] = Map(
    "w15_anomaly" -> w15Anomaly,
    "w10_gapfill" -> w10Gapfill,
    "f2_array_stats" -> f2ArrayStats,
    "a18_mode_exact" -> a18Mode,
    "a19_histogram" -> a19Histogram,
    "x11_fuzzy_probe" -> x11FuzzyProbe,
    "x12_fuzzy_pairs" -> x12FuzzyPairs)

  val oracles: Map[String, String] = Map(
    "w15_anomaly" -> w15Sql,
    "w10_gapfill" -> w10Sql,
    "f2_array_stats" -> f2Sql,
    "a18_mode_exact" -> a18Sql,
    "a19_histogram" -> a19Sql,
    "x11_fuzzy_probe" -> x11Sql,
    "x12_fuzzy_pairs" -> x12Sql)
}
