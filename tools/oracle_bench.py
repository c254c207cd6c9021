#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the judge's comparison baseline.

Runs every entry of oracle_sql.json against the sf dir's parquet views,
min-of-N warm, and prints per-query seconds plus the total, so Spark-side
BENCH_DETAIL mins can be ratio'd entry by entry.

Usage: python3 tools/oracle_bench.py <sfDir> <verifyOutDir> [passes=3]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    if len(sys.argv) < 3:
        print("Usage: python3 tools/oracle_bench.py <sfDir> <verifyOutDir> "
              "[passes=3]", file=sys.stderr)
        sys.exit(2)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    mins = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(passes):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        mins[name] = round(best, 3)
    for name, dt in sorted(mins.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  {name}")
    print(json.dumps({"total": round(sum(mins.values()), 3),
                      "n": len(mins), "passes": passes}))


if __name__ == "__main__":
    main()
