package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 decision-support extensions, part 3 — the remaining classic
  * warehouse shapes, adapted to the testdata schema (which has no
  * `partsupp` table and no commit/receipt dates on `lineitem`):
  * min-cost-supplier with a correlated per-part minimum (TPC-H Q2, unit
  * price standing in for supply cost), market share (Q8), profit by
  * nation and year (Q9, retail price standing in for supply cost),
  * returned-item top customers (Q10), important parts against a global
  * revenue total (Q11), supplier-count distributions (Q16), and the
  * only-late-supplier-in-a-multi-supplier-order shape (Q21, lateness
  * re-derived as ship > order date + 90 days). Every query carries an
  * exact DuckDB oracle.
  *
  * Exactness rules shared with [[DecisionSupportQueries]]: money flows
  * through DECIMAL(18,2) (exact sums, one final double cast), shares and
  * averages divide identical operands once (IEEE-deterministic on both
  * engines), threshold compares cross-multiply exact values instead of
  * comparing rounded quotients, and every output ends in a deterministic
  * total ORDER BY.
  */
object SupplyChainQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def rev: Column =
    dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))

  // ---- Q2: min-cost supplier — for each mid-size LARGE part, the
  // EUROPEan suppliers offering the minimum observed unit price
  // (l_extendedprice / l_quantity; the schema has no partsupp, so the
  // correlated MIN runs over lineitem facts). Both dimension sides
  // broadcast, so lineitem shuffles ONCE on (part, supplier) for the
  // pair-minimum; the correlated per-part minimum is a WINDOW over the
  // partkey — one more (vocabulary-sized) exchange, no join-back, no
  // self-scan. The winner filter is an equality on doubles that both
  // engines derived from identical IEEE divisions — exact, not epsilon.
  // Top-100 plans as TakeOrderedAndProject.
  private val q2MinCost: Q = (s, dir) => {
    val euro = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val parts = Tables.part(s, dir)
      .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
      .select(col("p_partkey"), col("p_name"))
    val pairMin = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euro.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit")).as("pair_min"), first(col("p_name")).as("pn"))
    pairMin
      .withColumn("part_min", min(col("pair_min")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))))
      .filter(col("pair_min") === col("part_min"))
      .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("s_suppkey"),
        col("n_name"), col("l_partkey").as("p_partkey"),
        col("pn").as("p_name"), col("part_min").as("min_unit_price"))
      // (s_suppkey, p_partkey) is the pair key → the ORDER BY is total,
      // so the LIMIT boundary can never flip between engines
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_suppkey"),
        col("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    """WITH euro AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |pair_min AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(l_extendedprice / l_quantity) AS pair_min,
      |    ANY_VALUE(p_name) AS pn
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  JOIN euro ON l_suppkey = s_suppkey
      |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      |  GROUP BY 1, 2),
      |part_min AS (
      |  SELECT l_partkey AS pk, MIN(pair_min) AS part_min
      |  FROM pair_min GROUP BY 1)
      |SELECT s_acctbal, s_name, s_suppkey, n_name,
      |  l_partkey AS p_partkey, pn AS p_name, part_min AS min_unit_price
      |FROM pair_min JOIN part_min
      |  ON l_partkey = pk AND pair_min = part_min
      |JOIN euro ON l_suppkey = s_suppkey
      |ORDER BY s_acctbal DESC, n_name, s_suppkey, p_partkey
      |LIMIT 100""".stripMargin

  // ---- Q8: market share — NATION_2's fraction of ASIA's PROMO-part
  // import volume by order year. Every dimension reduction (part type,
  // customer region, supplier nation) broadcasts; lineitem then probes
  // map-side and the orders join runs on the orderkey. The share divides
  // two EXACT decimal sums as doubles once — both engines divide the
  // same two numbers, so the quotient is bit-identical.
  private val q8MarketShare: Q = (s, dir) => {
    val promo = Tables.part(s, dir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    val asiaCust = Tables.customer(s, dir)
      .join(broadcast(asiaNations.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val asiaOrders = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(asiaOrders), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", rev)
          .otherwise(dec(lit(0)))).as("nation_vol"),
        sum(rev).as("total_vol"))
      .select(col("o_year"),
        (col("nation_vol").cast("double") / col("total_vol").cast("double"))
          .as("mkt_share"),
        col("total_vol").cast("double").as("total_volume"))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    """SELECT o_year,
      |  CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE) AS mkt_share,
      |  CAST(total_vol AS DOUBLE) AS total_volume
      |FROM (
      |  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
      |    SUM(CASE WHEN n2.n_name = 'NATION_2' THEN
      |      CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(1 - l_discount AS DECIMAL(18,2))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_vol,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(1 - l_discount AS DECIMAL(18,2))) AS total_vol
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1)
      |ORDER BY o_year""".stripMargin

  // ---- Q9: profit by supplier nation and order year over STANDARD
  // parts; with no partsupp in the schema, unit cost = p_retailprice.
  // Profit stays DECIMAL end to end: rev(18,2)² products minus
  // retail·qty products, summed exactly, one final double cast. Part and
  // supplier-nation broadcast into the lineitem scan; the only real
  // shuffle is lineitem⋈orders on the orderkey (at 100 TB co-bucketing
  // both facts on orderkey removes it), then a tiny (nation, year) agg.
  private val q9Profit: Q = (s, dir) => {
    val std = Tables.part(s, dir).filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, dir)
      .join(broadcast(std), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(rev - dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast("double").as("profit"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  private val q9Sql =
    """SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(1 - l_discount AS DECIMAL(18,2)) -
      |      CAST(p_retailprice AS DECIMAL(18,2)) *
      |      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_type = 'STANDARD'
      |GROUP BY n_name, o_year
      |ORDER BY n_name, o_year DESC""".stripMargin

  // ---- Q10: returned-item top customers — one quarter of orders, R
  // lines only, revenue per customer, top 20. The returnflag and date
  // predicates push to both parquet scans BEFORE the orderkey join; the
  // customer attach happens after the per-customer agg (≤ one row per
  // customer), so the wide customer row never rides the big shuffle.
  // Top-20 by exact-decimal revenue, custkey tie-break →
  // TakeOrderedAndProject.
  private val q10Returned: Q = (s, dir) => {
    val q4orders = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-10-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    returned
      .join(q4orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(rev).as("rev_d"), count(lit(1)).as("n_items"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("rev_d").cast("double").as("revenue"), col("n_items"),
        col("n_name"), col("c_acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items, n_name, c_acctbal
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1995-10-01'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---- Q11: important parts — parts holding more than 1/1500 of global
  // revenue. One shuffle on partkey builds the per-part sums; the global
  // total is a one-row broadcast over those sums (not a second scan).
  // The threshold compares value·1500 > total in EXACT decimals — a
  // double quotient would round differently across engines and flip
  // parts sitting on the boundary.
  private val q11ImportantParts: Q = (s, dir) => {
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(rev).as("value"))
    val total = perPart.agg(sum(col("value")).as("grand"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value") * 1500 > col("grand"))
      .select(col("l_partkey").as("p_partkey"),
        col("value").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  private val q11Sql =
    """WITH per_part AS (
      |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(1 - l_discount AS DECIMAL(18,2))) AS value
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
      |FROM per_part
      |WHERE value * 1500 > (SELECT SUM(value) FROM per_part)
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  // ---- Q16: supplier-count distribution — distinct suppliers able to
  // ship each surviving (brand, type, size) combination, derived from
  // lineitem facts (no partsupp in the schema). The part dimension
  // broadcasts with its filters applied; COUNT(DISTINCT) then runs as
  // Spark's two-phase distinct aggregate: partial dedup of
  // (brand, type, size, suppkey) map-side, so the shuffle carries the
  // combination×supplier vocabulary, not lineitem rows.
  private val q16SupplierCnt: Q = (s, dir) => {
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---- Q21: the only-late supplier — suppliers who were the SOLE late
  // shipper (ship > order date + 90 days; the schema has no receipt/
  // commit dates) in a finished multi-supplier order. One orderkey
  // shuffle joins lineitem to finished orders; the per-(order, supplier)
  // dedup-with-late-flag is ONE aggregate, and the per-order supplier
  // census (distinct suppliers, distinct late suppliers) is a WINDOW
  // over the deduped pairs — the double-EXISTS shape costs the big join
  // exchange plus two vocabulary-sized ones, with no join-back. The
  // final per-supplier count is supplier-vocabulary-sized. Top-20.
  private val q21Waiting: Q = (s, dir) => {
    val pairLate = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
    pairLate
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late",
        sum(when(col("late"), 1L).otherwise(0L)).over(w))
      .filter(col("late") && col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  private val q21Sql =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'),
      |census AS (
      |  SELECT l_orderkey AS ok, COUNT(DISTINCT l_suppkey) AS n_supp,
      |    COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      |  FROM lines GROUP BY 1),
      |late_pairs AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE late)
      |SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM late_pairs JOIN census
      |  ON l_orderkey = ok AND n_supp >= 2 AND n_late = 1
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 20""".stripMargin

  // ---- Q12: shipping-mode priority census — of the lines shipped LATE
  // (ship > order date + 60 days; the schema has no commit/receipt
  // dates), how many belonged to critical-priority orders vs not, per
  // "mode" (l_returnflag stands in for the absent l_shipmode — the shape
  // only needs a low-cardinality line-level categorical). The orders
  // side is reduced to (orderkey, orderdate, 0/1 critical flag) BEFORE
  // the join — the priority string never rides the shuffle — the
  // lateness predicate rides the join itself, and the fact-fact join
  // on orderkey is the only real exchange (at 100 TB co-bucketing both
  // facts on orderkey removes it); the per-mode agg output is 3 rows.
  // All counts are exact BIGINTs — hash compare cannot be flaky.
  private val q12ShipMode: Q = (s, dir) => {
    val crit = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("is_crit"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(crit, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag").as("ship_mode"))
      .agg(sum(col("is_crit")).as("high_line_count"),
        sum(lit(1L) - col("is_crit")).as("low_line_count"))
      .orderBy(col("ship_mode"))
  }

  private val q12Sql =
    """SELECT l_returnflag AS ship_mode,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---- Q20: part-promotion suppliers — suppliers in one nation holding
  // "excess stock" of PROMO parts. With no partsupp/availqty, stock
  // outside the probe year stands in for available quantity: a
  // (supplier, part) pair qualifies when its non-1996 shipments exceed
  // half its 1996 shipments (and 1996 saw any). The correlated per-pair
  // aggregate is computed in ONE pass — conditional sums inside a single
  // (suppkey, partkey) agg, never a self-join — and the threshold
  // cross-multiplies exact BIGINTs (quantities are integral). The
  // qualifying-supplier set is supplier-vocabulary-sized and broadcasts
  // into a LEFT SEMI join against the nation-filtered dimension, which
  // is Q20's nested-IN chain decorrelated. Part filter broadcasts into
  // the scan, so lineitem shuffles once on the pair key.
  private val q20PromoSuppliers: Q = (s, dir) => {
    val promo = Tables.part(s, dir).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val qty = col("l_quantity").cast("long")
    val in96 = col("l_shipdate") >= lit("1996-01-01") &&
      col("l_shipdate") < lit("1997-01-01")
    val qualifying = Tables.lineitem(s, dir)
      // NULL shipdates would fall into `otherwise` on the Spark side but
      // into ELSE on the DuckDB side with opposite bucketing — exclude
      // them explicitly in BOTH plans so the pair stays equivalent.
      .filter(col("l_shipdate").isNotNull)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(when(in96, qty).otherwise(0L)).as("qty_96"),
        sum(when(!in96, qty).otherwise(0L)).as("qty_rest"))
      .filter(col("qty_96") > 0 && col("qty_rest") * 2 > col("qty_96"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(qualifying),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q20Sql =
    """WITH pair AS (
      |  SELECT l_suppkey, l_partkey,
      |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l_shipdate < TIMESTAMP '1997-01-01'
      |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qty_96,
      |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l_shipdate < TIMESTAMP '1997-01-01'
      |      THEN 0 ELSE CAST(l_quantity AS BIGINT) END) AS qty_rest
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO' AND l_shipdate IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM pair
      |    WHERE qty_96 > 0 AND qty_rest * 2 > qty_96)
      |ORDER BY s_name""".stripMargin

  val defs: Map[String, Q] = Map(
    "q2_min_cost_supplier" -> q2MinCost,
    "q12_shipmode" -> q12ShipMode,
    "q20_promo_suppliers" -> q20PromoSuppliers,
    "q8_market_share" -> q8MarketShare,
    "q9_profit" -> q9Profit,
    "q10_returned" -> q10Returned,
    "q11_important_parts" -> q11ImportantParts,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q21_waiting_supplier" -> q21Waiting)

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q12_shipmode" -> q12Sql,
    "q20_promo_suppliers" -> q20Sql,
    "q8_market_share" -> q8Sql,
    "q9_profit" -> q9Sql,
    "q10_returned" -> q10Sql,
    "q11_important_parts" -> q11Sql,
    "q16_supplier_cnt" -> q16Sql,
    "q21_waiting_supplier" -> q21Sql)
}
