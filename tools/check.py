#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle (oracle_sql.json) on the same sf dir.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        wc, gc = sorted(want.columns), sorted(got.columns)
        if wc != gc:
            print(f"FAIL {name}: columns differ: oracle={wc} spark={gc}")
            n_bad += 1
            continue
        w = [tuple(norm(v) for v in row) for row in want[wc].itertuples(index=False)]
        g = [tuple(norm(v) for v in row) for row in got[wc].itertuples(index=False)]
        if len(w) != len(g):
            print(f"FAIL {name}: rows differ: oracle={len(w)} spark={len(g)}")
            n_bad += 1
            continue
        # exact, order-sensitive compare first; a sorted-only match is a
        # FAILURE when the query declares ORDER BY (ADVICE r1: ordering
        # regressions must not pass the local gate)
        if w == g:
            print(f"OK   {name} ({len(w)} rows, ordered)")
            n_ok += 1
        elif sorted(w) == sorted(g):
            if "ORDER BY" in sql.upper():
                print(f"FAIL {name}: values match only after sorting, "
                      f"but the query declares ORDER BY")
                n_bad += 1
            else:
                print(f"OK   {name} ({len(w)} rows, unordered)")
                n_ok += 1
        else:
            n_bad += 1
            sw, sg = sorted(w), sorted(g)
            diffs = [(a, b) for a, b in zip(sw, sg) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs (oracle vs spark):")
            for a, b in diffs:
                print(f"   oracle: {a}")
                print(f"   spark : {b}")
    print(f"=== {n_ok} ok, {n_bad} fail ===")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
