package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}
import graft.sources.Skew

/** Round-3 catalog extensions: the join/aggregation surface a complete
  * engine needs beyond the reference's own operators — as-of and banded
  * range joins (custom operators in [[graft.operators]]), salted-join
  * correctness on real tables, rollup / grouping-sets / exact percentiles,
  * date-part aggregation, intersect/except, sliding window frames, and a
  * TPC-H Q3-shaped join-agg-topk pipeline. Every query has an exact DuckDB
  * oracle.
  *
  * Scale notes per query are inline; the common rules: dimension sides
  * broadcast, money sums go through DECIMAL(18,2), every output carries a
  * total deterministic ORDER BY.
  */
object ExtendedQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- J3: TPC-H Q3 shape — filtered fact ⋈ fact ⋈ broadcast dim,
  // partial agg, top-10 via TakeOrderedAndProject (no global sort).
  private val j3Shipping: Q = (s, dir) => {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1995-03-15"))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1995-03-15"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val j3Sql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---- J6: as-of join — every click carries its user's most recent
  // purchase at-or-before the click ([[AsOfJoin]]: one shuffle, no fan-out).
  // Tie handling: AsOfJoin's rightTiebreak picks the GREATEST event_id
  // among duplicate-(user_id, ts) purchases — deterministic, and exactly
  // equivalent to deduplicating the right side to that winner first. The
  // ORACLE does the explicit dedup (QUALIFY keeping max event_id), because
  // DuckDB's ASOF JOIN does not document which duplicate-timestamp row it
  // picks — after the dedup the oracle never exercises that unspecified
  // tie, while the Spark side keeps its single-shuffle no-fan-out plan
  // (shape-asserted in PlanShapeSpec).
  private val j6AsOf: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_event_id"),
        col("value").as("purchase_value"))
    AsOfJoin.backward(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_event_id", "purchase_value"),
        rightTiebreak = Some("purchase_event_id"))
      .select(col("event_id"), col("user_id"),
        col("purchase_event_id"), col("purchase_value"))
      .orderBy(col("event_id"))
  }

  private val j6Sql =
    """SELECT l.event_id, l.user_id,
      |  r.purchase_event_id, r.purchase_value
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |                  event_id AS purchase_event_id, value AS purchase_value
      |                FROM events WHERE event_type = 'purchase'
      |                QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
      |                  ORDER BY event_id DESC) = 1) r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ---- J9: forward as-of join — every click carries its user's NEXT
  // purchase at-or-after the click (time-to-conversion shape; same
  // one-shuffle plan as j6, scan order reversed).
  // Tie handling mirrors j6 with the forward rule: Spark's rightTiebreak
  // picks the LEAST event_id; the oracle dedups to that winner explicitly.
  private val j9AsOfForward: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("next_purchase_id"),
        col("value").as("next_purchase_value"))
    AsOfJoin.forward(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("next_purchase_id", "next_purchase_value"),
        rightTiebreak = Some("next_purchase_id"))
      .select(col("event_id"), col("user_id"),
        col("next_purchase_id"), col("next_purchase_value"))
      .orderBy(col("event_id"))
  }

  private val j9Sql =
    """SELECT l.event_id, l.user_id,
      |  r.next_purchase_id, r.next_purchase_value
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |                  event_id AS next_purchase_id, value AS next_purchase_value
      |                FROM events WHERE event_type = 'purchase'
      |                QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
      |                  ORDER BY event_id ASC) = 1) r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ---- J7: banded range join — per error event, activity of the same user
  // in the following 12 hours ([[RangeJoin]]: equi-join on (key, band),
  // bounded ≤2× left amplification instead of a per-key cross product).
  private val j7Range: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val follows = ev.select(col("user_id"), col("ts").as("f_ts"),
      col("event_id").as("f_event_id"), col("value").as("f_value"))
    val pairs = RangeJoin.timeBand(errors, follows, Seq("user_id"),
      leftTime = "ts", rightTime = "f_ts",
      lowerExclusiveMicros = 0L,
      upperInclusiveMicros = 12L * 3600L * 1000000L)
    val perError = pairs.groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_follow"),
        sum(dec(col("f_value"))).cast("double").as("follow_value"))
    errors.join(perError, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_follow"), lit(0L)).as("n_follow"),
        coalesce(col("follow_value"), lit(0.0)).as("follow_value"))
      .orderBy(col("event_id"))
  }

  private val j7Sql =
    """SELECT a.event_id, a.user_id, COUNT(b.event_id) AS n_follow,
      |  CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS follow_value
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'error') a
      |LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      |           FROM events) b
      |  ON a.user_id = b.user_id AND b.ts > a.ts
      |  AND b.ts <= a.ts + INTERVAL 12 HOUR
      |GROUP BY a.event_id, a.user_id
      |ORDER BY a.event_id""".stripMargin

  // ---- J8: salted join ≡ plain join — [[Skew.saltedJoin]] on real tables,
  // oracled by the unsalted SQL (the salt is an implementation detail the
  // result must not observe). The small side replicates 8× instead of
  // broadcasting — the broadcast-ineligible skew case.
  private val j8Salted: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedJoin(ev, cust, "user_id", saltBuckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  private val j8Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- A7: rollup with GROUPING markers — hierarchical subtotals in one
  // pass (Spark expands grouping sets before the partial agg, so the
  // shuffle carries (keys × sets) pre-combined rows, not raw data).
  private val a7Rollup: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))

  private val a7Sql =
    """SELECT COALESCE(l_returnflag, '<all>') AS rf,
      |  COALESCE(l_linestatus, '<all>') AS ls,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, rf, ls""".stripMargin

  // ---- A8: non-hierarchical grouping sets — two independent groupings in
  // one scan instead of two jobs + union.
  private val a8GroupingSets: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("total"))
      .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("n"), col("total"))
      .orderBy(col("rf"), col("ls"))

  private val a8Sql =
    """SELECT COALESCE(l_returnflag, '<all>') AS rf,
      |  COALESCE(l_linestatus, '<all>') AS ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY rf, ls""".stripMargin

  // ---- A9: exact percentiles (linear interpolation) — both engines use
  // rank = q·(n−1) with linear interpolation, and quarter fractions over
  // integer-valued quantities make every intermediate exact in binary, so
  // the match is cell-exact, not approximate. (The approximate twin for
  // the 100 TB path is x4_approx_stats.)
  private val a9Percentiles: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val a9Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- Q2: date-part aggregation (year/month buckets) — datetime function
  // surface with exact money sums.
  private val q2DateAgg: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("yr"), col("mo"))

  private val q2Sql =
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
      |  EXTRACT(MONTH FROM o_orderdate) AS mo,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  // ---- A10: pivot (long→wide reshape) — per-year order counts by status.
  // Explicit pivot values keep the plan a single pass (no distinct-values
  // pre-query) — at scale the value list is a required argument anyway.
  private val a10Pivot: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("yr"))

  private val a10Sql =
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // ---- U5/U6: INTERSECT / EXCEPT (distinct set semantics on both
  // engines) — customers buying in both price bands / only the high band.
  private def bandHigh(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey"))
  private def bandLow(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_totalprice") < 50000.0)
      .select(col("o_custkey"))

  private val u5Intersect: Q = (s, dir) =>
    bandHigh(s, dir).intersect(bandLow(s, dir)).orderBy(col("o_custkey"))

  private val u5Sql =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0
      |ORDER BY o_custkey""".stripMargin

  private val u6Except: Q = (s, dir) =>
    bandHigh(s, dir).except(bandLow(s, dir)).orderBy(col("o_custkey"))

  private val u6Sql =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0
      |ORDER BY o_custkey""".stripMargin

  // ---- W5: sliding window frame (ROWS BETWEEN 3 PRECEDING AND CURRENT
  // ROW) — rolling sums with exact decimal arithmetic inside the frame.
  private val w5MovingSum: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        sum(dec(col("value"))).over(w).cast("double").as("roll_value"),
        count(lit(1)).over(w).as("roll_n"))
      .orderBy(col("event_id"))
  }

  private val w5Sql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_value,
      |  COUNT(*) OVER w AS roll_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- A11: max_by/min_by (≡ DuckDB arg_max/arg_min) — "row that wins
  // the aggregate". Ordered by a composite BIGINT (price cents × 10¹⁰ +
  // orderkey, exact via DECIMAL) because FP ties would make the winner
  // nondeterministic and DuckDB 1.0 arg_max takes no struct ordering.
  // Headroom: TPC-H price cents < 10⁸, orderkey < 6×10⁶·SF (< 10¹⁰ up to
  // SF1000), so the composite stays below 10¹⁸ < BIGINT max and is
  // collision-free at every scale factor we could ever run.
  private val a11MinMaxBy: Q = (s, dir) => {
    val composite = (dec(col("o_totalprice")) * 100).cast("long") *
      lit(10000000000L) + col("o_orderkey")
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(max_by(col("o_orderkey"), composite).as("best_order"),
        min_by(col("o_orderkey"), composite).as("worst_order"),
        max(col("o_totalprice")).as("max_price"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  private val a11Sql =
    """SELECT c_mktsegment,
      |  arg_max(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey) AS best_order,
      |  arg_min(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey) AS worst_order,
      |  MAX(o_totalprice) AS max_price, COUNT(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---- Q5: TPC-H Q5 shape — cyclic 6-table join (the supplier join
  // closes the cycle on BOTH l_suppkey and c_nationkey), all dimensions
  // broadcast, partial agg on nation.
  private val q5LocalVolume: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    Tables.lineitem(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---- W6: RANGE frame — trailing 1-hour event-time window per user
  // (value-based frame over integer microseconds, vs w5's row-count frame).
  private val w6RangeFrame: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        sum(dec(col("value"))).over(w).cast("double").as("hour_value"),
        count(lit(1)).over(w).as("hour_n"))
      .orderBy(col("event_id"))
  }

  private val w6Sql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_value,
      |  COUNT(*) OVER w AS hour_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- A12: scalar subquery — orders above the corpus-wide average
  // price, counted per priority. The scalar (one row) side joins in as a
  // BROADCAST nested loop over a single row — the idiomatic Spark plan for
  // `WHERE x > (SELECT agg FROM ...)`; no shuffle is added to the probe
  // side. The average is integer cents floor-divided by the count, so the
  // threshold is an exact BIGINT on both engines (a DOUBLE avg would make
  // the comparison FP-summation-order-dependent).
  private val a12ScalarSubquery: Q = (s, dir) => {
    val cents = (dec(col("o_totalprice")) * 100).cast("long")
    // `div` = exact integral division on BIGINT (≡ DuckDB `//` for
    // non-negative operands); a double `/` + cast could round across an
    // integer boundary and disagree with the oracle by one cent.
    val avgCents = Tables.orders(s, dir)
      .agg(sum(cents).as("s"), count(lit(1)).as("c"))
      .selectExpr("s div c AS avg_cents")
    Tables.orders(s, dir)
      .join(broadcast(avgCents))
      .filter(cents > col("avg_cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val a12Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_above, MAX(o_totalprice) AS max_price
      |FROM orders
      |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >
      |  (SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) // COUNT(*) AS BIGINT)
      |   FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- Q6: TPC-H Q6 shape — pure multi-predicate scan-aggregate. The
  // point is pushdown: date range, discount band, and quantity cap all
  // reach the parquet reader (PushedFilters), and the single-row result
  // needs no shuffle beyond the final partial-agg merge.
  private val q6RangeFilter: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  private val q6Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  val defs: Map[String, Q] = Map(
    "a12_scalar_subquery" -> a12ScalarSubquery,
    "q6_range_filter" -> q6RangeFilter,
    "j3_shipping_priority" -> j3Shipping,
    "j6_asof_join" -> j6AsOf,
    "j7_range_join" -> j7Range,
    "j9_asof_forward" -> j9AsOfForward,
    "j8_salted_join" -> j8Salted,
    "a7_rollup" -> a7Rollup,
    "a8_grouping_sets" -> a8GroupingSets,
    "a9_percentiles" -> a9Percentiles,
    "a10_pivot" -> a10Pivot,
    "q2_date_agg" -> q2DateAgg,
    "u5_intersect" -> u5Intersect,
    "u6_except" -> u6Except,
    "w5_moving_sum" -> w5MovingSum,
    "w6_range_frame" -> w6RangeFrame,
    "a11_minmax_by" -> a11MinMaxBy,
    "q5_local_volume" -> q5LocalVolume)

  val oracles: Map[String, String] = Map(
    "a12_scalar_subquery" -> a12Sql,
    "q6_range_filter" -> q6Sql,
    "j3_shipping_priority" -> j3Sql,
    "j6_asof_join" -> j6Sql,
    "j7_range_join" -> j7Sql,
    "j9_asof_forward" -> j9Sql,
    "j8_salted_join" -> j8Sql,
    "a7_rollup" -> a7Sql,
    "a8_grouping_sets" -> a8Sql,
    "a9_percentiles" -> a9Sql,
    "a10_pivot" -> a10Sql,
    "q2_date_agg" -> q2Sql,
    "u5_intersect" -> u5Sql,
    "u6_except" -> u6Sql,
    "w5_moving_sum" -> w5Sql,
    "w6_range_frame" -> w6Sql,
    "a11_minmax_by" -> a11Sql,
    "q5_local_volume" -> q5Sql)
}
