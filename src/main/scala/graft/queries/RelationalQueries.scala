package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator catalog (SURVEY.md §2.2-§2.6) exercised on the
  * TPC-H-ish testdata tables, each with a DuckDB oracle.
  *
  * Oracle-parity rules used throughout:
  *  - money sums go through DECIMAL(18,2) on BOTH sides so the sum is exact
  *    and independent of shuffle order (double summation is not);
  *  - every output has a total deterministic ORDER BY;
  *  - aggregate / computed columns carry identical aliases on both sides.
  *
  * At 100 TB scale the same plans hold: dimension joins are broadcast
  * (region/nation/customer/part are small or pre-bucketable), fact scans
  * push filters + pruned columns into parquet, aggregations are partial
  * (map-side) hash aggs, and the top-k uses TakeOrderedAndProject — no
  * global sort materializes.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Cast a money column to exact decimal for order-independent sums. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // A4 metrics-style agg — TPC-H Q1 shape (pricing summary).
  // Reference analog: storage/metrics.py:52-77 (counts + conditional counts).
  private val q1Agg: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      |  AVG(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // F1 predicate pushdown — TPC-H Q6 shape. All three filters reach the
  // parquet scan (PushedFilters in .explain).
  // Reference analog: retrieval/search.py:89-97 (metadata filters in WHERE).
  private val f1Filter: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount") >= lit(0.02) && col("l_discount") <= lit(0.04) &&
        col("l_quantity") < lit(24))
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  private val f1Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24""".stripMargin

  // J1 star join: fact ⋈ three dims, all broadcast (region=5, nation=25,
  // customer small relative to orders — and at 100 TB customer would be the
  // one to shuffle while nation/region stay broadcast).
  // Reference analog: retrieval/search.py:108-110 (collection scoping join).
  private val j1Join: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("r_name"))
  }

  private val j1Sql =
    """SELECT r_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // J2 left join + null-context semantics (missing parent ⇒ null), the
  // context-expansion shape. Reference: retrieval/context.py:84-86.
  private val j2LeftJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
      .groupBy(coalesce(col("p_brand"), lit("<missing>")).as("brand"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("brand"))
  }

  private val j2Sql =
    """SELECT COALESCE(p_brand, '<missing>') AS brand,
      |  COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY brand""".stripMargin

  // J5 left-semi (EXISTS) — golden-query expectation match shape.
  // Reference: api/cli/quality.py:34-100.
  private val j5Semi: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  private val j5Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer WHERE EXISTS
      |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // U4 left-anti (NOT EXISTS) — the OCR-cache set-difference shape.
  // Right side filtered to big orders so the anti set is non-empty (every
  // customer has SOME order in this data — an unfiltered anti join would
  // be a vacuous 0-row check). Reference: pymupdf_parser.py:407-412.
  private val u4Anti: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val u4Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer WHERE NOT EXISTS
      |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  // A3 top-N per group via row_number window — result-grouping cap.
  // Reference: retrieval/grouping.py:96-118 (top-3 per parent_id).
  private val a3TopN: Q = (s, dir) => {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("rn"))
      .orderBy(col("l_orderkey"), col("rn"))
  }

  private val a3Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin

  // T1 top-k without full sort: Catalyst plans TakeOrderedAndProject —
  // the exact-KNN physical shape (ORDER BY sim DESC LIMIT k).
  // Reference: retrieval/search.py:99-124.
  private val t1TopK: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  private val t1Sql =
    """SELECT o_orderkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // A5 duplicate-group metric: GROUP BY ... HAVING COUNT(*)>1.
  // Reference: storage/metrics.py:78-88.
  private val a5DupGroups: Q = (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") > 1)
      .orderBy(col("o_custkey"))

  private val a5Sql =
    """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      |GROUP BY o_custkey HAVING COUNT(*) > 1 ORDER BY o_custkey""".stripMargin

  // A6 value-distribution metric with missing-coalesce + deterministic
  // tie-break. Reference: storage/metrics.py:89-106.
  private val a6Distribution: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(coalesce(col("event_type"), lit("<missing>")).as("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))
      .limit(10)

  private val a6Sql =
    """SELECT COALESCE(event_type, '<missing>') AS event_type, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY n DESC, event_type LIMIT 10""".stripMargin

  // U1/U2 union of differently-processed branches (caption augmentation
  // shape). Reference: app/pipeline.py:158-164, concept_builder.py:142-188.
  private val u1Union: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val open = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"),
        lit("open").as("branch"))
    val big = o.filter(col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), col("o_totalprice"),
        lit("big").as("branch"))
    open.unionByName(big)
      .groupBy(col("branch"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("branch"))
  }

  private val u1Sql =
    """SELECT branch, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT o_orderkey, o_totalprice, 'open' AS branch FROM orders WHERE o_orderstatus = 'O'
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'big' AS branch FROM orders WHERE o_totalprice > 200000.0
      |) u GROUP BY branch ORDER BY branch""".stripMargin

  // X11-style carry-forward window fill + lag delta per key, ordered by
  // time. Reference: app/parents.py:47-92 (stateful parent-id carry).
  private val w1WindowLag: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", col("value") - col("prev_value"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("prev_value"), col("delta"))
      .orderBy(col("event_id"))
  }

  private val w1Sql =
    """SELECT event_id, user_id, value,
      |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value,
      |  value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS delta
      |FROM events ORDER BY event_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "f1_filter_pushdown" -> f1Filter,
    "j1_star_join" -> j1Join,
    "j2_left_join_expand" -> j2LeftJoin,
    "j5_semi_join" -> j5Semi,
    "u4_anti_join" -> u4Anti,
    "a3_topn_per_group" -> a3TopN,
    "t1_topk" -> t1TopK,
    "a5_dup_groups" -> a5DupGroups,
    "a6_distribution" -> a6Distribution,
    "u1_union_branches" -> u1Union,
    "w1_window_lag" -> w1WindowLag)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "f1_filter_pushdown" -> f1Sql,
    "j1_star_join" -> j1Sql,
    "j2_left_join_expand" -> j2Sql,
    "j5_semi_join" -> j5Sql,
    "u4_anti_join" -> u4Sql,
    "a3_topn_per_group" -> a3Sql,
    "t1_topk" -> t1Sql,
    "a5_dup_groups" -> a5Sql,
    "a6_distribution" -> a6Sql,
    "u1_union_branches" -> u1Sql,
    "w1_window_lag" -> w1Sql)
}
