#!/usr/bin/env python3
"""Generate localdata/sf5 for the three-decade family soak: the
document-ish tables (documents, embeddings, events) at 5x localdata/sf1
(= 50x the driver's sf0.1) with key remapping, the TPC-H side copied
from sf1 unchanged (VERDICT r9 task #1: "docs-heavy; TPC-H side can
stay sf1"). Dev tooling for the scale soak - NOT driver data; do not
use for correctness gates.

Replica q prefixes document text with 'q<q> ' so exact-duplicate
structure does not explode the TEXT dedup families 5x (sf1 already
uses 'r<r> ' prefixes; the two namespaces compose to unique texts
across the 50 underlying replicas). EMBEDDINGS deliberately replicate
bit-identically (as in gen_sf1): near-dup groups therefore grow to 50
copies per base item and pair-producing output (v4) grows as
C(50,2)/C(10,2) ~ 27x — the soak's envelope is output-aware for
exactly this reason, asserting time-linear-in-work rather than
pretending pair output can stay linear on a replicated corpus.
"""
import duckdb, os, shutil, sys

SRC = "localdata/sf1"
DST = sys.argv[1] if len(sys.argv) > 1 else "localdata/sf5"
R = 5
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t in ["documents", "embeddings", "events"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

def mx(table, col):
    return con.execute(f"SELECT max({col})+1 FROM {table}").fetchone()[0]

DOC, EVT, USR, VEC = mx("documents","doc_id"), mx("events","event_id"), mx("events","user_id"), mx("embeddings","vec_id")

def gen(t, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(t, n)

rep = f"(SELECT unnest(range({R})) AS q)"
# n_chars must track the replica prefix ('q<q> ' adds len('q')+len(q)+1
# chars) or 4/5 of the corpus carries a stale count (ADVICE r10)
gen("documents", f"""SELECT doc_id + q*{DOC} AS doc_id,
  CASE WHEN q=0 THEN text ELSE 'q' || q || ' ' || text END AS text,
  lang, source,
  CASE WHEN q=0 THEN n_chars
       ELSE n_chars + length('q' || q || ' ') END AS n_chars
  FROM documents, {rep}""")
gen("embeddings", f"SELECT vec_id + q*{VEC} AS vec_id, embedding, label FROM embeddings, {rep}")
gen("events", f"SELECT event_id + q*{EVT} AS event_id, ts, user_id + q*{USR} AS user_id, event_type, value, props FROM events, {rep}")
for t in ["region","nation","customer","supplier","part","orders","lineitem"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(t, "copied from sf1")
