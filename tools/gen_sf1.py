#!/usr/bin/env python3
"""Generate localdata/sf1 by 10x replication of /root/testdata/sf0.1 with
key remapping (replica 0 = identity). Dev tooling for the scale soak —
NOT driver data; do not use for correctness gates.

Replica r offsets every primary/foreign key by r*ceil(max+1) so joins
keep TPC-H-ish selectivity; document/event text gets a per-replica prefix
so exact-duplicate structure does not explode dedup queries 10x.
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf1"
R = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

def mx(table, col):
    return con.execute(f"SELECT max({col})+1 FROM {table}").fetchone()[0]

CUST, SUPP, PART, ORD = mx("customer","c_custkey"), mx("supplier","s_suppkey"), mx("part","p_partkey"), mx("orders","o_orderkey")
DOC, EVT, USR, VEC = mx("documents","doc_id"), mx("events","event_id"), mx("events","user_id"), mx("embeddings","vec_id")

def gen(t, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, n)

rep = f"(SELECT unnest(range({R})) AS r)"
gen("region", "SELECT * FROM region")
gen("nation", "SELECT * FROM nation")
gen("customer", f"SELECT c_custkey + r*{CUST} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer, {rep}")
gen("supplier", f"SELECT s_suppkey + r*{SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier, {rep}")
gen("part", f"SELECT p_partkey + r*{PART} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part, {rep}")
gen("orders", f"SELECT o_orderkey + r*{ORD} AS o_orderkey, o_custkey + r*{CUST} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders, {rep}")
gen("lineitem", f"""SELECT l_orderkey + r*{ORD} AS l_orderkey, l_partkey + r*{PART} AS l_partkey,
  l_suppkey + r*{SUPP} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate FROM lineitem, {rep}""")
gen("events", f"SELECT event_id + r*{EVT} AS event_id, ts, user_id + r*{USR} AS user_id, event_type, value, props FROM events, {rep}")
gen("documents", f"""SELECT doc_id + r*{DOC} AS doc_id,
  CASE WHEN r=0 THEN text ELSE 'r' || r || ' ' || text END AS text,
  lang, source, n_chars FROM documents, {rep}""")
gen("embeddings", f"SELECT vec_id + r*{VEC} AS vec_id, embedding, label FROM embeddings, {rep}")
