#!/usr/bin/env bash
# Same-window bench pair (r12, the r8 rule made mechanical): pin the DuckDB
# baseline and measure the engine in ONE idle window so the ratio measures
# the engine, not box weather.
#
#   1. dump the current oracle set
#   2. N back-to-back DuckDB runs (reps=1 each), per-query MIN merged into
#      BASELINE_DUCKDB.json (conservative: fastest DuckDB, the ratio can
#      only worsen — the r9 pin protocol)
#   3. two back-to-back engine Bench runs against the fresh pins
#
# Usage: scripts/bench_same_window.sh [sfDir] [nDuckRuns]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
N="${2:-3}"
ORACLES=/tmp/oracle_sql_pin.json

echo "[pin] dumping oracle set" >&2
sbt -batch "runMain graft.DumpOracles $ORACLES" >/dev/null

for i in $(seq 1 "$N"); do
  echo "[pin] duckdb run $i/$N" >&2
  python3 scripts/bench_duckdb.py "$SF_DIR" "$ORACLES" "/tmp/duck_pin_$i.json" 1 \
    2>/dev/null
done

python3 - "$SF_DIR" "$N" <<'EOF'
import json, sys
sf_dir, n = sys.argv[1], int(sys.argv[2])
runs = [json.load(open(f"/tmp/duck_pin_{i}.json")) for i in range(1, n + 1)]
queries = {q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]}
out = {"sf_dir": sf_dir, "reps": f"min-per-query of {n} back-to-back runs",
       "total_sec": round(sum(queries.values()), 3), "queries": queries}
json.dump(out, open("BASELINE_DUCKDB.json", "w"), indent=1, sort_keys=True)
print(json.dumps({"pinned_total": out["total_sec"], "n": len(queries)}))
EOF

for i in 1 2; do
  echo "[pin] engine bench run $i/2" >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1
done
