package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 catalog extensions — the decision-support surface that was still
  * missing from the relational inventory: correlated-EXISTS decorrelation
  * (TPC-H Q4 shape), conditional-aggregate ratios over a broadcast dim
  * (Q14 shape), multi-column DISTINCT aggregation (Catalyst's Expand path),
  * and the navigation/rank window families (lead / ntile / percent_rank /
  * cume_dist and first / last / nth value frames). Every query carries an
  * exact DuckDB oracle.
  *
  * Scale notes inline; shared rules: dimensions broadcast, money through
  * DECIMAL(18,2), ratios divide exact sums (both engines do ONE double
  * division on identical operands — IEEE-deterministic), deterministic
  * total ORDER BY on every output.
  */
object DecisionSupportQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---- Q4: correlated EXISTS (TPC-H Q4 shape) — orders with at least one
  // item shipped more than 90 days after the order date, counted per
  // priority. Spark's decorrelated plan is a LEFT SEMI join on the order
  // key with the non-equi ship-lag predicate attached to the join — the
  // probe side never fans out (an order with 7 late items still counts
  // once, with no pre-dedup pass over lineitem), and both sides shuffle
  // once on l_orderkey. At 100 TB both facts arrive hash-partitioned on
  // the key; bucketed layout (TableLayout) would drop even that exchange.
  private val q4Exists: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- Q14: conditional-aggregate ratio (TPC-H Q14 shape) — promo share
  // of revenue for one ship month. `part` broadcasts (it is a dimension);
  // the CASE folds into the partial agg so the shuffle carries two decimal
  // sums per partition, not rows. The percentage is one double division of
  // two exactly-summed decimals — identical operands on both engines.
  private val q14Promo: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01") &&
        col("l_shipdate") < lit("1996-04-01"))
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    val rev = dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(dec(lit(0))))
          .as("promo_rev"),
        sum(rev).as("total_rev"),
        count(lit(1)).as("n_items"))
      .select(
        (lit(100.0) * col("promo_rev").cast("double") /
          col("total_rev").cast("double")).as("promo_pct"),
        col("total_rev").cast("double").as("total_revenue"),
        col("n_items"))
  }

  private val q14Sql =
    """SELECT
      |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_pct,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  // ---- A13: multi-column DISTINCT aggregation — distinct customers and
  // distinct order years per priority alongside plain aggregates. Two
  // different DISTINCT key sets force Catalyst's Expand strategy (each
  // input row replicates once per distinct-agg group with nulled-out other
  // keys, then two hash aggs); the expansion factor is the number of
  // distinct clauses — bounded, unlike a self-join per clause. At 100 TB
  // the exact form shuffles every distinct (priority, key) pair once;
  // the sketch twin (x4's approx_count_distinct) is the cheap path.
  private val a13DistinctAgg: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))

  private val a13Sql =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) AS n_years,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- W8: navigation + rank window family — lead, ntile, percent_rank,
  // cume_dist per user over event time. The (ts, event_id) order is a
  // total order (event_id unique), so every function is deterministic;
  // percent_rank/cume_dist are one double division of exact integer
  // rank/count — bit-identical across engines. One shuffle on user_id
  // serves all four functions (same window spec ⇒ one Window operator).
  private val w8RankNav: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        lead(col("value"), 1).over(w).as("next_value"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("event_id"))
  }

  private val w8Sql =
    """SELECT event_id, user_id,
      |  lead(value, 1) OVER w AS next_value,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY event_id""".stripMargin

  // ---- W9: value-extraction window family — first / last / nth value
  // over the full partition frame (ROWS UNBOUNDED PRECEDING..UNBOUNDED
  // FOLLOWING stated explicitly: the DEFAULT frame stops at CURRENT ROW,
  // which would silently turn last_value into "current value" on both
  // engines). Same single user_id shuffle as w8.
  private val w9ValueWindows: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        first(col("value")).over(w).as("first_value"),
        last(col("value")).over(w).as("last_value"),
        nth_value(col("value"), 3).over(w).as("third_value"))
      .orderBy(col("event_id"))
  }

  private val w9Sql =
    """SELECT event_id, user_id,
      |  first_value(value) OVER w AS first_value,
      |  last_value(value) OVER w AS last_value,
      |  nth_value(value, 3) OVER w AS third_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  // ---- Q18: HAVING + join-back (TPC-H Q18 shape) — "large-volume
  // orders": the IN-subquery (orderkeys whose quantity sum exceeds the
  // threshold) decorrelates to an aggregate + join. Lineitem shuffles ONCE
  // on l_orderkey for the partial-agg sum; the HAVING survivors are a tiny
  // fraction (<2% here, far less at TPC-H's canonical 300), so they
  // BROADCAST back against orders — the probe side never shuffles — and
  // customer broadcasts as a dimension. Top-100 by price plans as
  // TakeOrderedAndProject.
  private val q18BigOrders: Q = (s, dir) => {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250.0)
    Tables.orders(s, dir)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(l_quantity) > 250) big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---- A14: CUBE — all four grouping combinations (rollup's superset) in
  // one pass; like a7/a8, Spark expands the grouping sets BEFORE the
  // partial agg, so the shuffle carries pre-combined (keys × 4 sets) rows.
  private val a14Cube: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))

  private val a14Sql =
    """SELECT COALESCE(l_returnflag, '<all>') AS rf,
      |  COALESCE(l_linestatus, '<all>') AS ls,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, rf, ls""".stripMargin

  // ---- A15: UNPIVOT (wide→long, the inverse reshape of a10's pivot) —
  // per-year status counts melted back to (yr, status, n) rows. Narrow
  // map work over the already-aggregated wide rows: each input row emits
  // one output row per value column, no extra shuffle beyond the pivot's
  // own aggregation.
  private val a15Unpivot: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .unpivot(Array(col("yr")), Array(col("F"), col("O"), col("P")),
        "status", "n")
      .orderBy(col("yr"), col("status"))

  private val a15Sql =
    """WITH wide AS (
      |  SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
      |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |  FROM orders GROUP BY 1)
      |SELECT yr, status, n FROM wide UNPIVOT (n FOR status IN ("F", "O", "P"))
      |ORDER BY yr, status""".stripMargin

  // ---- A16: ordered string aggregation (LISTAGG / string_agg WITHIN
  // GROUP) — the top-5 orders per priority as one ordered CSV cell,
  // composed with a rank window. Deterministic because the WITHIN GROUP
  // order (price desc, orderkey) is total; Spark plans the listagg as a
  // sort-based aggregate AFTER the partial-agg shuffle, so the shuffle
  // carries only the 5 surviving rows per group.
  private val a16Listagg: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("listagg(CAST(o_orderkey AS STRING), ',') " +
          "WITHIN GROUP (ORDER BY o_totalprice DESC, o_orderkey)")
          .as("top_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("top_value"))
      .orderBy(col("o_orderpriority"))
  }

  private val a16Sql =
    """SELECT o_orderpriority,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ','
      |    ORDER BY o_totalprice DESC, o_orderkey) AS top_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS top_value
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_orderpriority
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 5
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- A17: statistical aggregation — Pearson correlation of quantity vs
  // price per return flag, computed from EXACT integer power sums (n, Σx,
  // Σy, Σxy, Σx², Σy²) so the result is bit-identical across engines.
  // Built-in corr()/covar() use incremental one-pass updates whose float
  // rounding is engine- and partition-order-dependent — unusable as a
  // cross-engine gate — but the power sums are plain integer aggregates
  // (partial+final hash agg, partitioning-independent), and the final
  // r = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) is one fixed
  // IEEE sequence over exactly-rounded casts of those sums. The y-heavy
  // sums (Σy², and Σxy beyond ~SF 34k) exceed BIGINT, so they accumulate
  // in DECIMAL (Spark) / HUGEINT (DuckDB) — both exact integers, both
  // cast to double by round-to-nearest.
  private val a17CorrExact: Q = (s, dir) => {
    val x = col("l_quantity").cast("long")
    val y = (dec(col("l_extendedprice")) * 100).cast("long")
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val syyD = col("syy").cast("double")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        // per-row products fit BIGINT, but the GROUP SUMS of the y-heavy
        // ones do not at advertised scale: Σ(x·y) crosses 2⁶³ near SF
        // 34,000 (~34 TB) and Σ(y²) far earlier — both accumulate in
        // DECIMAL (HUGEINT on the DuckDB side). Σx, Σy, Σx² stay BIGINT
        // (overflow beyond 10⁵ SF ≈ 100 PB).
        sum((x * y).cast("decimal(30,0)")).as("sxy"), sum(x * x).as("sxx"),
        sum((y * y).cast("decimal(30,0)")).as("syy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        ((nD * sxyD - sxD * syD) /
          (sqrt(nD * sxxD - sxD * sxD) * sqrt(nD * syyD - syD * syD)))
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  private val a17Sql =
    """SELECT l_returnflag, n,
      |  CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |  (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |   sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(CAST(x * y AS HUGEINT)) AS sxy,
      |    SUM(x * x) AS sxx, SUM(CAST(y * y AS HUGEINT)) AS syy
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  val defs: Map[String, Q] = Map(
    "a16_listagg" -> a16Listagg,
    "a17_corr_exact" -> a17CorrExact,
    "q18_big_orders" -> q18BigOrders,
    "a14_cube" -> a14Cube,
    "a15_unpivot" -> a15Unpivot,
    "q4_exists_subquery" -> q4Exists,
    "q14_promo_ratio" -> q14Promo,
    "a13_distinct_agg" -> a13DistinctAgg,
    "w8_rank_navigation" -> w8RankNav,
    "w9_value_windows" -> w9ValueWindows)

  val oracles: Map[String, String] = Map(
    "a16_listagg" -> a16Sql,
    "a17_corr_exact" -> a17Sql,
    "q18_big_orders" -> q18Sql,
    "a14_cube" -> a14Sql,
    "a15_unpivot" -> a15Sql,
    "q4_exists_subquery" -> q4Sql,
    "q14_promo_ratio" -> q14Sql,
    "a13_distinct_agg" -> a13Sql,
    "w8_rank_navigation" -> w8Sql,
    "w9_value_windows" -> w9Sql)
}
