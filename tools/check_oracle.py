#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the
testdata parquet tables, sorts columns by name + rows by all columns, and
compares values cell-by-cell (exact for ints/strings, exact-or-tiny-eps
report for floats so mismatches are visible).

Dev tool only — not part of the shipped library (the driver has its own).
"""
import json, math, sys, glob, os
import duckdb

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return (a is None) == (b is None)
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # exact — the gate hashes, so exact is the bar
    except TypeError:
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/run error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        # Driver hashes stringified values, so int64 vs float64 (e.g. DuckDB
        # HUGEINT → pandas float) mismatches even when values compare equal.
        kind_bad = [c for c in g.columns if g[c].dtype.kind != w[c].dtype.kind]
        if kind_bad:
            for c in kind_bad:
                print(f"  {name}.{c}: dtype spark={g[c].dtype} duck={w[c].dtype}")
            print(f"FAIL {name}: dtype kind mismatch")
            n_fail += 1
            continue
        bad = 0
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                xn = None if (isinstance(x, float) and math.isnan(x)) else x
                yn = None if (isinstance(y, float) and math.isnan(y)) else y
                if hasattr(xn, "item"): xn = xn.item()
                if hasattr(yn, "item"): yn = yn.item()
                if not cmp_cell(xn, yn):
                    if bad < 3:
                        print(f"  {name}.{c}[{i}]: spark={xn!r} duck={yn!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
            n_pass += 1
    # round-13 ledger hygiene: the no-oracle queries carry a real verdict
    # in checks.json (self predicates + golden pins evaluated by Verify)
    n_cpass = n_cfail = 0
    checks_path = os.path.join(out_dir, "checks.json")
    if os.path.exists(checks_path):
        checks = json.load(open(checks_path))
        cfg = checks.pop("_config", {})
        for name, c in sorted(checks.items()):
            if c.get("passed"):
                print(f"PASS {name} [check={c['check']}] {c.get('detail','')}")
                n_cpass += 1
            else:
                print(f"FAIL {name} [check={c['check']}] {c.get('detail','')}")
                n_cfail += 1
        print(f"checks config: {cfg}")
    print(f"== {n_pass} oracle pass + {n_cpass} check pass / "
          f"{n_fail + n_cfail} fail ==")
    sys.exit(1 if (n_fail + n_cfail) else 0)

if __name__ == "__main__":
    main()
