#!/usr/bin/env python3
"""Pin an absolute single-node baseline for BENCH comparisons.

The reference publishes no performance numbers (BASELINE.md), so the "within
2x of baseline" gate had no denominator. This script times every DuckDB
oracle query (the SQL twins Verify dumps as oracle_sql.json) on the same
parquet fixtures, median of N reps on all cores — an honest, strong
single-node columnar-engine baseline for the identical computations.

Output: BASELINE_DUCKDB.json, consumed by graft.Bench to emit the
suite-vs-DuckDB ratio in its one-line JSON report.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> <out.json> [reps]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, out_path, reps=3):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_json))
    times = {}
    for name, sql in sorted(oracle.items()):
        rs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            rs.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(rs), 4)
        print(f"[duckdb] {name:32s} {times[name]:8.3f} s", file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"total_sec": out["total_sec"], "n_queries": len(times)}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 3)
