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
# Artifact layout (VERDICT r16 item 7): the repo ROOT carries only the
# current round's committed artifacts — one clean pair
# (bench_pair_<tag>_spark.json + duck_bench_<tag>.json) plus the per-round
# BENCH_* files the driver writes; everything else (older rounds, demoted
# suspects, failed attempts) lives in bench/, and this script enforces the
# rotation and maintains the bench/README.md index table.
# Bench.committedBaseline searches both root and bench/.
#
#   scripts/bench_pair.sh <sfDir> <tag> [attempts=3] [oracle_sql.json]
#
# e.g. scripts/bench_pair.sh /root/testdata/sf0.1 r17
# Writes: bench_pair_<tag>_spark.json, duck_bench_<tag>.json; demotes
#         suspect/failed attempts to bench/ with a _suspect_<i>/_failed_<i>
#         suffix (a crash or truncated JSON is recorded, never lost —
#         ADVICE r16: under set -e the old script aborted before any
#         bookkeeping).
set -e
cd "$(dirname "$0")/.."
SF="$1"; TAG="$2"; ATTEMPTS="${3:-3}"; ORACLE="${4:-}"
mkdir -p bench

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
  # guarded: a Bench crash must be recorded like a suspect, not abort the
  # script before any bookkeeping (set -e would otherwise exit here)
  if ! SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$SPARK_OUT" \
      scripts/run.sh graft.Bench > "/tmp/bench_pair_${TAG}_run$i.log" 2>&1; then
    echo "[bench_pair] attempt $i CRASHED (see /tmp/bench_pair_${TAG}_run$i.log tail):"
    tail -3 "/tmp/bench_pair_${TAG}_run$i.log" || true
    [ -f "$SPARK_OUT" ] && mv "$SPARK_OUT" "bench/bench_pair_${TAG}_failed_$i.json"
    continue
  fi
  # guarded verdict: truncated/malformed output demotes as a failed attempt
  if ! verdict=$(python3 - "$SPARK_OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
suspect = d.get("window_suspect", False)
flagged = len(d.get("regressions", {})) + len(d.get("regressions_vs_committed", {}))
print("SUSPECT" if (suspect or flagged > 0) else "CLEAN")
print(f"total={d.get('value')} flagged={flagged} window_suspect={suspect}")
EOF
  ); then
    echo "[bench_pair] attempt $i produced unparseable $SPARK_OUT; demoting"
    [ -f "$SPARK_OUT" ] && mv "$SPARK_OUT" "bench/bench_pair_${TAG}_failed_$i.json"
    continue
  fi
  echo "$verdict" | tail -1
  if echo "$verdict" | head -1 | grep -q CLEAN; then clean=1; break; fi
  mv "$SPARK_OUT" "bench/bench_pair_${TAG}_suspect_$i.json"
  echo "[bench_pair] attempt $i suspect -> bench/bench_pair_${TAG}_suspect_$i.json; re-running"
done
if [ "$clean" -ne 1 ]; then
  echo "[bench_pair] NO CLEAN RUN after $ATTEMPTS attempts — box is not quiet; keeping demoted attempts in bench/ only" >&2
  exit 2
fi

echo "[bench_pair] duckdb side (same session)..."
python3 scripts/duck_bench.py "$SF" "$ORACLE" 3 "duck_bench_${TAG}.json" | tail -1
python3 - "$SPARK_OUT" "duck_bench_${TAG}.json" <<'EOF'
import json, sys
s = json.load(open(sys.argv[1])); d = json.load(open(sys.argv[2]))
print(f"[bench_pair] PAIR: spark={s['value']}s duck={d['value']}s ratio={s['value']/d['value']:.2f}x")
EOF

# rotate: every pair/bench artifact in root that is NOT this tag's (nor a
# BENCH_* file of this tag's round) moves to bench/
shopt -s nullglob
for f in bench_pair_*.json duck_bench_*.json; do
  case "$f" in
    bench_pair_${TAG}_spark.json|duck_bench_${TAG}.json) ;;
    *) echo "[bench_pair] rotating $f -> bench/"; mv "$f" "bench/$f" ;;
  esac
done

# refresh the bench/README.md index table
python3 - "$TAG" <<'EOF'
import glob, json, os, sys
tag = sys.argv[1]
def row(path):
    try:
        d = json.load(open(path))
        val = d.get("value", "")
        sf = d.get("sf", "")
    except Exception:
        val, sf = "unparseable", ""
    return f"| `{path}` | {val} | {sf} |"
lines = ["# Bench artifacts",
         "",
         "Root = the current round's committed artifacts only; this directory",
         "holds every prior round plus demoted suspect/failed attempts.",
         "Maintained by `scripts/bench_pair.sh` (layout: VERDICT r16 item 7).",
         "",
         f"Current committed pair: tag `{tag}` (repo root).",
         "",
         "| artifact | total_s | sf |",
         "|---|---|---|"]
for p in sorted(glob.glob("bench/*.json")):
    lines.append(row(p))
open("bench/README.md", "w").write("\n".join(lines) + "\n")
print(f"[bench_pair] bench/README.md updated ({len(glob.glob('bench/*.json'))} archived artifacts)")
EOF
