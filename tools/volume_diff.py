#!/usr/bin/env python3
"""Compare per-query volume witnesses between two bench artifacts.

Usage: volume_diff.py OLD_bench.json NEW_bench.json [--rt] [--tol 1.3]

For every query present in both records, compares bytes_shuffled and
rows_scanned (and bytes_read) from the "volumes" field. Volumes are
facts of plan + data, so any growth past --tol is a PLAN regression by
definition — while a time regression with flat volumes is host noise.
Exit code 1 if any query grew past tolerance.

--rt compares the read-through pass volumes instead of the compute pass.
"""
import json
import sys


def load(path, rt):
    with open(path) as f:
        d = json.loads(f.readline())
    vols = (d.get("readthrough", {}) if rt else d).get("volumes")
    if vols is None:
        sys.exit(f"{path}: no volumes field (pre-r13 artifact?)")
    return vols


def main():
    argv = sys.argv[1:]
    rt = "--rt" in argv
    argv = [a for a in argv if a != "--rt"]
    tol = 1.3
    if "--tol" in argv:
        i = argv.index("--tol")
        tol = float(argv[i + 1])
        del argv[i:i + 2]
    if len(argv) != 2:
        sys.exit(__doc__)
    old, new = load(argv[0], rt), load(argv[1], rt)
    shared = sorted(set(old) & set(new))
    grew, shrank = [], 0
    for q in shared:
        for field, label in (("sh", "bytes_shuffled"), ("rows", "rows_scanned"),
                             ("in", "bytes_read")):
            o, n = old[q].get(field, 0), new[q].get(field, 0)
            floor = 64 * 1024 if field != "rows" else 1000
            if n > max(o * tol, o + floor):
                grew.append((q, label, o, n))
            elif o > max(n * tol, n + floor):
                shrank += 1
    print(f"{len(shared)} shared queries "
          f"({len(set(new) - set(old))} new, {len(set(old) - set(new))} gone); "
          f"{len(grew)} grew past x{tol}, {shrank} shrank past x{tol}")
    for q, label, o, n in grew:
        print(f"  GREW {q} {label}: {o} -> {n} ({n / max(o, 1):.2f}x) "
              f"— plan regression")
    if not grew:
        print("volumes flat ⇒ any time delta is host noise, not the plan")
    sys.exit(1 if grew else 0)


if __name__ == "__main__":
    main()
