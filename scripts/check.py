#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads Verify.scala output (outDir/<name>/ parquet + oracle_sql.json),
registers the fixture tables as DuckDB views, runs each oracle, and
compares rows after sorting columns by name — approximating the driver's
row/schema/hash match.

Usage: check.py <sfDir> <verifyOutDir>
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
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols)
                + f" FROM spark_rel").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols)
                + " FROM duck_rel").fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            continue
        if spark_cols != duck_cols:
            failures.append(name)
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            na = tuple(norm(x) for x in a)
            nb = tuple(norm(x) for x in b)
            if na != nb:
                bad = (i, na, nb)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} duck={bad[2]}")
        else:
            print(f"ok   {name} ({len(spark_rows)} rows)")
    # every declared query must have produced output (a failed Verify run
    # leaves no directory but still exits 0 — catch that here)
    import os
    declared_path = os.path.join(out_dir, "queries.json")
    if os.path.exists(declared_path):
        declared = set(json.load(open(declared_path)))
        produced = {n for n in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, n))}
        for name in sorted(declared - produced):
            failures.append(name)
            print(f"FAIL {name}: declared but produced no output (Verify error?)")
    # oracle-less queries: rows > 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or name in oracle:
            continue
        try:
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{path}/*.parquet')").fetchone()[0]
            status = "ok  " if n > 0 else "FAIL"
            if n == 0:
                failures.append(name)
            print(f"{status} {name} (oracle-less, {n} rows)")
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name} (oracle-less): {e}")
    print(f"\n{len(failures)} failures" + (": " + ", ".join(failures) if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
