#!/usr/bin/env python3
"""Mechanical oracle-binder gate (round-9).

Runs DuckDB EXPLAIN on every declared oracle SQL so an oracle that does not
even bind (wrong function form, typo'd column, unsupported lateral join)
fails fast — without running Verify or any Spark query.

Usage:
  sbt "runMain graft.DumpOracles /tmp/oracle_sql.json"
  python3 scripts/oracle_lint.py /root/testdata/sf0.001 /tmp/oracle_sql.json

Views are registered over the real sf0.001 parquet (schemas only matter;
EXPLAIN reads no data), so runtime is seconds.

Round-11 addition: each oracle's output relation is also DESCRIBEd (plans,
reads no data) and any HUGEINT/UHUGEINT output column fails the lint —
DuckDB silently widens sum(BIGINT) to int128, which is value-identical but
fails any type-sensitive driver hash (the two-round-red q_graph_pagerank
class). An uncast sum() must be CAST back to BIGINT in the oracle SQL.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_json))
    failures = []
    banned = ("HUGEINT", "UHUGEINT")
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            failures.append(name)
            msg = str(e).splitlines()[0] if str(e) else type(e).__name__
            print(f"FAIL {name}: {msg}")
            continue
        bad = [(c[0], c[1]) for c in cols
               if any(b in str(c[1]).upper() for b in banned)]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: int128 output column(s) {bad} — "
                  f"CAST the sum/product chain back to BIGINT")
    print(f"[oracle-lint] {len(oracle)} oracles, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
