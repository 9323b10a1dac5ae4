package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 decision-support extensions, part 2 — the remaining classic
  * warehouse shapes: left-join distributions (TPC-H Q13), nation-pair
  * volume (Q7), view-on-aggregate winner pick (Q15), correlated per-group
  * average thresholds (Q17), disjunctive join predicates (Q19), and
  * NOT-EXISTS against an exact global average (Q22). Every query carries an
  * exact DuckDB oracle.
  *
  * Exactness rules shared with [[DecisionSupportQueries]]: money flows
  * through DECIMAL(18,2) (exact sums, one final double cast), averages are
  * compared via integer cross-multiplication or divided once on identical
  * operands (IEEE-deterministic), and every output ends in a deterministic
  * total ORDER BY.
  */
object WarehouseQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def rev: Column =
    dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))

  // ---- Q13: customer order-count distribution — LEFT join so zero-order
  // customers survive with c_count = 0, then a second aggregation over the
  // counts. The first join/agg shuffles both sides on the customer key
  // (orders pre-filtered map-side: the priority predicate touches only the
  // orders columns, so it pushes to the parquet scan, NOT into the join);
  // the second agg's domain is tiny (distinct counts), so its shuffle
  // carries a few dozen pre-combined rows per partition. At 100 TB both
  // facts arrive hash-partitioned on custkey; bucketing both tables on the
  // customer key would remove the big exchange entirely.
  private val q13Custdist: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- Q7: volume shipped between two nations by year. The nation filter
  // is applied BEFORE any fact-fact join: suppliers and customers reduce to
  // 2/25 of their tables, orders joined to the filtered customers reduce
  // the same way, and both reduced sides broadcast — the only shuffle left
  // is the final (nation, nation, year) aggregation. At 100 TB orders⋈cust
  // would be a real shuffle, but the 12× semi-reduction from the nation
  // predicate still happens first; the lineitem probe side never shuffles.
  private val q7Volume: Q = (s, dir) => {
    val nations = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val sn = Tables.supplier(s, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cn = Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ocn = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ocn), col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(rev).cast("double").as("volume"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(vol) AS DOUBLE) AS volume, COUNT(*) AS n_items
      |FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |        EXTRACT(YEAR FROM l_shipdate) AS l_year,
      |        CAST(l_extendedprice AS DECIMAL(18,2)) *
      |          CAST(1 - l_discount AS DECIMAL(18,2)) AS vol
      |      FROM lineitem
      |      JOIN supplier ON l_suppkey = s_suppkey
      |      JOIN nation sn ON s_nationkey = sn.n_nationkey
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN customer ON o_custkey = c_custkey
      |      JOIN nation cn ON c_nationkey = cn.n_nationkey
      |      WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      |        AND cn.n_name IN ('NATION_1', 'NATION_2')
      |        AND sn.n_name <> cn.n_name)
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---- Q15: top supplier by revenue over one quarter — an aggregate used
  // twice (per-supplier revenue, and its max) without recomputing the scan:
  // the revenue aggregate is small (one row per supplier), so its max is a
  // one-row broadcast and the winner filter is a map-side equality against
  // EXACT decimal sums (ties impossible to lose: every tied supplier
  // appears, ordered by key). Lineitem shuffles once, on l_suppkey.
  private val q15TopSupplier: Q = (s, dir) => {
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_rev"))
    val top = revenue.agg(max(col("total_rev")).as("mx"))
    revenue.join(broadcast(top), col("total_rev") === col("mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---- Q17: small-quantity revenue — rows below 20% of their part's
  // average quantity. The correlated per-part average decorrelates to an
  // aggregate over the SAME brand-filtered join, re-joined by part key; the
  // brand dimension broadcasts, so lineitem reduces 25× map-side before the
  // per-part agg shuffle, and the aggregate (≤ one row per surviving part)
  // broadcasts back — the probe side never shuffles. The threshold compare
  // is `qty < 0.2 * (Σqty / n)`: Σqty is an exact double (integer-valued
  // quantities), so both engines divide and multiply identical operands.
  private val q17SmallQty: Q = (s, dir) => {
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#5").select(col("p_partkey"))
    val branded = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val perPart = branded.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("cnt"))
    branded.join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") <
        lit(0.2) * (col("sq") / col("cnt").cast("double")))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
        .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  private val q17Sql =
    """WITH branded AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#5'),
      |per_part AS (
      |  SELECT l_partkey AS pk, SUM(l_quantity) AS sq, COUNT(*) AS cnt
      |  FROM branded GROUP BY l_partkey)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM branded JOIN per_part ON l_partkey = pk
      |WHERE l_quantity < 0.2 * (sq / CAST(cnt AS DOUBLE))""".stripMargin

  // ---- Q19: disjunctive join predicate — OR-of-ANDs across both join
  // sides. The disjunction itself cannot push below the join, but its
  // derivable envelope can: `l_quantity BETWEEN 1 AND 30` is implied by all
  // three branches and is stated explicitly so the parquet scan prunes on
  // it (Catalyst does not infer predicate envelopes from disjunctions).
  // Part broadcasts; the residual OR evaluates map-side after the hash
  // probe, so the whole query is scan → broadcast-probe → one-row agg.
  private val q19Disjunctive: Q = (s, dir) => {
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
    val branch2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(10, 30) && col("l_quantity").between(5, 25)
    val branch3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(20, 50) && col("l_quantity").between(10, 30)
    Tables.lineitem(s, dir)
      .filter(col("l_quantity").between(1, 30)) // envelope → parquet scan
      .join(broadcast(p), col("l_partkey") === col("p_partkey") &&
        (branch1 || branch2 || branch3))
      .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |         AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |         AND l_quantity BETWEEN 5 AND 25)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |         AND l_quantity BETWEEN 10 AND 30)""".stripMargin

  // ---- Q22: idle rich customers — above-average balance, no orders.
  // "Above average" is decided by integer cross-multiplication
  // (bal_cents · n > Σcents) over exact cent sums, NOT by comparing
  // against a floating average — the two engines would round a double
  // average differently and could flip customers sitting on the line.
  // The global (Σ, n) is a one-row broadcast; the order check is a LEFT
  // ANTI join (shuffles both sides on the customer key; at 100 TB a bloom
  // or bucketed layout on custkey removes it).
  private val q22IdleRich: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        (dec(col("c_acctbal")) * 100).cast("long").as("bal_cents"))
    val stats = c.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("s"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(stats))
      .filter(col("bal_cents") * col("n") > col("s"))
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        (sum(col("bal_cents")).cast("double") / 100.0).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q22Sql =
    """WITH c AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
      |  FROM customer),
      |stats AS (
      |  SELECT SUM(bal_cents) AS s, COUNT(*) AS n FROM c WHERE bal_cents > 0)
      |SELECT c_mktsegment, COUNT(*) AS n_custs,
      |  CAST(SUM(bal_cents) AS DOUBLE) / 100.0 AS total_bal
      |FROM c, stats
      |WHERE bal_cents * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val defs: Map[String, Q] = Map(
    "q13_custdist" -> q13Custdist,
    "q7_nation_volume" -> q7Volume,
    "q15_top_supplier" -> q15TopSupplier,
    "q17_small_qty" -> q17SmallQty,
    "q19_disjunctive" -> q19Disjunctive,
    "q22_idle_rich" -> q22IdleRich)

  val oracles: Map[String, String] = Map(
    "q13_custdist" -> q13Sql,
    "q7_nation_volume" -> q7Sql,
    "q15_top_supplier" -> q15Sql,
    "q17_small_qty" -> q17Sql,
    "q19_disjunctive" -> q19Sql,
    "q22_idle_rich" -> q22Sql)
}
