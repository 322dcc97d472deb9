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
# Artifact layout (VERDICT r16 item 7, ADVICE r17): the repo ROOT carries
# only the CURRENT round's committed artifacts — one clean pair
# (bench_pair_<tag>_spark.json + duck_bench_<tag>.json) plus THIS round's
# driver-written BENCH_r<N>/BENCH_sf*_r<N> files; everything else (older
# rounds' pairs AND BENCH files, demoted suspects, failed attempts) lives
# in bench/, and this script enforces the rotation and maintains the
# bench/README.md index table. Bench.committedBaseline searches both
# root and bench/.
#
# Load normalization (VERDICT r17 item 2): StageFloor runs immediately
# before the spark side and after the duck side; both measurements are
# embedded in both artifacts and a floor-adjusted total/ratio
# (raw - executed_stages x mean ms/stage) is reported next to the raw one.
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

# Load normalization (VERDICT r17 item 2): the pair ratio drifted
# 0.89->1.30 across rounds while per-row evidence said the code got
# faster — the mechanism is the box's per-stage scheduling floor swinging
# 87-145 ms day-to-day, which Spark rows stack 5-30 deep and DuckDB never
# pays. Measure the floor immediately BEFORE the spark bench and AFTER
# the duck bench, embed both in both artifacts, and report a
# floor-adjusted total (raw - stages x mean floor, using the per-row
# executed-stage counts Bench now records) next to the raw one.
stage_floor() {
  scripts/run.sh graft.tools.StageFloor 3 2>/dev/null | grep per_stage_floor_ms | tail -1
}
echo "[bench_pair] measuring scheduling floor (before)..."
FLOOR_BEFORE=$(stage_floor)
echo "[bench_pair] floor before: $FLOOR_BEFORE"

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

echo "[bench_pair] measuring scheduling floor (after)..."
FLOOR_AFTER=$(stage_floor)
echo "[bench_pair] floor after: $FLOOR_AFTER"

# Embed both floor measurements in both artifacts (load stamps) and
# compute the floor-adjusted pair. Two estimators, both emitted:
#
#  - EFFECTIVE per-stage floor, self-calibrated from the pair itself:
#    median(spark_q / stages_q) over rows whose DuckDB time is < 50 ms —
#    rows with essentially no real work, so their whole Spark wall IS
#    scheduling. The synthetic no-op chain (StageFloor) overestimates the
#    in-bench floor (r18: chain said 149-198 ms/stage while the bench's
#    own floor rows ran 89 ms/stage — subtracting the chain number went
#    NEGATIVE, sum(stages)xfloor > wall). The chain floors stay in the
#    artifact as before/after load stamps; the adjustment uses the
#    empirical floor, per-row clamped at 0:
#      value_floor_adjusted = sum_q max(spark_q - stages_q x eff, 0)
#  - WORK-ROW ratio: sum over rows with duck_q >= 0.2 s (floor amortized
#    on both sides) — no model at all, just restriction to rows where
#    the engines do comparable real work. SCALE.md tracks this on a
#    FIXED 40-row set across rounds; here it's this pair's own >=0.2 s set.
python3 - "$SPARK_OUT" "duck_bench_${TAG}.json" "$FLOOR_BEFORE" "$FLOOR_AFTER" <<'EOF'
import json, statistics, sys
spath, dpath = sys.argv[1], sys.argv[2]
fb = json.loads(sys.argv[3]) if sys.argv[3].strip() else {}
fa = json.loads(sys.argv[4]) if sys.argv[4].strip() else {}
s = json.load(open(spath)); d = json.load(open(dpath))
stages = s.get("stages", {})
total_stages = sum(stages.values())
sq, dq = s["queries"], d["queries"]
common = set(sq) & set(dq)
# effective floor from this pair's own floor-dominated rows
floor_rows = [sq[q] / stages[q] for q in common
              if dq[q] < 0.05 and stages.get(q, 0) > 0]
eff = statistics.median(floor_rows) if len(floor_rows) >= 10 else (
    fb.get("per_stage_floor_ms", 0) / 1000.0 or None)
adj = None
if eff and total_stages > 0:
    adj = round(sum(max(sq[q] - stages.get(q, 0) * eff, 0.0) for q in sq), 3)
# work-row ratio (model-free)
work = [q for q in common if dq[q] >= 0.2]
sw, dw = sum(sq[q] for q in work), sum(dq[q] for q in work)
for obj in (s, d):
    obj["stage_floor_before"] = fb or None
    obj["stage_floor_after"] = fa or None
s["total_stages"] = total_stages
s["effective_stage_floor_ms"] = round(eff * 1000, 1) if eff else None
s["floor_rows_n"] = len(floor_rows)
s["value_floor_adjusted"] = adj
s["ratio_raw"] = round(s["value"] / d["value"], 3)
if adj is not None:
    s["ratio_floor_adjusted"] = round(adj / d["value"], 3)
s["work_rows"] = {"n": len(work), "duck_threshold_s": 0.2,
                  "spark_s": round(sw, 1), "duck_s": round(dw, 1),
                  "ratio": round(sw / dw, 3) if dw else None}
json.dump(s, open(spath, "w")); json.dump(d, open(dpath, "w"))
print(f"[bench_pair] PAIR: spark={s['value']}s duck={d['value']}s ratio={s['value']/d['value']:.2f}x")
if adj is not None:
    print(f"[bench_pair] FLOOR-ADJUSTED: eff floor={eff*1000:.1f}ms/stage (n={len(floor_rows)} floor rows,"
          f" chain said {fb.get('per_stage_floor_ms')}/{fa.get('per_stage_floor_ms')}) x {total_stages} stages"
          f" -> spark_adj={adj}s ratio_adj={adj/d['value']:.2f}x")
print(f"[bench_pair] WORK-ROW (duck>=0.2s, n={len(work)}): spark={sw:.1f}s duck={dw:.1f}s"
      f" ratio={sw/dw:.2f}x")
EOF

# rotate: every pair/bench artifact in root that is NOT this tag's (nor a
# BENCH_* file of this tag's ROUND — driver-written BENCH_r<N>/BENCH_sf*_r<N>
# files of PRIOR rounds rotate too, ADVICE r17) moves to bench/
ROUND=$(echo "$TAG" | grep -oE '^r[0-9]+' || true)
shopt -s nullglob
for f in bench_pair_*.json duck_bench_*.json BENCH_r*.json BENCH_sf*_r*.json; do
  case "$f" in
    bench_pair_${TAG}_spark.json|duck_bench_${TAG}.json) ;;
    BENCH_${ROUND}.json|BENCH_sf*_${ROUND}.json) ;;  # current round's driver files stay
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
