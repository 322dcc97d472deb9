#!/bin/bash
# Clean bench-pair protocol, automated (VERDICT r15 item 1: twice the
# round's committed bench was measurement-muddied — r15's 192.3 s
# window_suspect line vs the real 126.1 s). Runs graft.Bench and the
# DuckDB oracle bench in ONE session; if the Spark line reports
# window_suspect:true or any flagged rows, the run is demoted to a side
# artifact and re-run (up to ATTEMPTS times). Only a CLEAN run becomes
# bench_pair_<tag>_spark.json; the DuckDB side then runs immediately
# after on the same box (the r14 pair protocol).
#
#   scripts/bench_pair.sh <sfDir> <tag> [attempts=3] [oracle_sql.json]
#
# e.g. scripts/bench_pair.sh /root/testdata/sf0.1 r16
# Writes: bench_pair_<tag>_spark.json, duck_bench_<tag>.json,
#         bench_pair_<tag>_suspect_<i>.json for each demoted attempt.
set -e
cd "$(dirname "$0")/.."
SF="$1"; TAG="$2"; ATTEMPTS="${3:-3}"; ORACLE="${4:-}"

if [ -z "$ORACLE" ]; then
  # the DuckDB side replays the oracle SQL the correctness gate dumps;
  # content depends only on code, so one fresh Verify dump serves
  ORACLE="/tmp/bench_pair_${TAG}_verify/oracle_sql.json"
  if [ ! -f "$ORACLE" ]; then
    echo "[bench_pair] dumping oracle SQL via graft.Verify..."
    scripts/run.sh graft.Verify "$SF" "/tmp/bench_pair_${TAG}_verify" >/dev/null 2>&1
  fi
fi

SPARK_OUT="bench_pair_${TAG}_spark.json"
clean=0
for i in $(seq 1 "$ATTEMPTS"); do
  echo "[bench_pair] spark bench attempt $i/$ATTEMPTS..."
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$SPARK_OUT" \
    scripts/run.sh graft.Bench > "/tmp/bench_pair_${TAG}_run$i.log" 2>&1
  verdict=$(python3 - "$SPARK_OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
suspect = d.get("window_suspect", False)
flagged = len(d.get("regressions", {})) + len(d.get("regressions_vs_committed", {}))
print("SUSPECT" if (suspect or flagged > 0) else "CLEAN")
print(f"total={d.get('value')} flagged={flagged} window_suspect={suspect}")
EOF
)
  echo "$verdict" | tail -1
  if echo "$verdict" | head -1 | grep -q CLEAN; then clean=1; break; fi
  mv "$SPARK_OUT" "bench_pair_${TAG}_suspect_$i.json"
  echo "[bench_pair] attempt $i suspect -> bench_pair_${TAG}_suspect_$i.json; re-running"
done
if [ "$clean" -ne 1 ]; then
  echo "[bench_pair] NO CLEAN RUN after $ATTEMPTS attempts — box is not quiet; keeping suspects only" >&2
  exit 2
fi

echo "[bench_pair] duckdb side (same session)..."
python3 scripts/duck_bench.py "$SF" "$ORACLE" 3 "duck_bench_${TAG}.json" | tail -1
python3 - "$SPARK_OUT" "duck_bench_${TAG}.json" <<'EOF'
import json, sys
s = json.load(open(sys.argv[1])); d = json.load(open(sys.argv[2]))
print(f"[bench_pair] PAIR: spark={s['value']}s duck={d['value']}s ratio={s['value']/d['value']:.2f}x")
EOF
