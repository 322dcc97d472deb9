#!/bin/bash
# Shard one big compare.py run into N parallel processes (the r13 sf10
# full-gate recipe, scripted): split <outDir>'s query subdirs into N
# shard dirs (symlinks + the shared oracle_sql.json), give each process
# a slice of the thread/memory budget, and run them concurrently.
#
#   scripts/compare_sharded.sh <sfDir> <outDir> [N=4]
#
# Prints each shard's log path and a combined SUMMARY line.
set -e
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; N="${3:-4}"
# Derive the per-shard budget from THIS host (not a hard-coded
# 32-thread/72GB box) and clamp to >=1 so N > cores never yields a
# zero-thread DuckDB.
CORES=$(nproc 2>/dev/null || echo 4)
MEM_TOTAL_GB=$(( $(awk '/MemTotal/{print $2}' /proc/meminfo 2>/dev/null || echo 8388608) / 1048576 ))
MEM_BUDGET_GB=$(( MEM_TOTAL_GB * 3 / 5 ))   # leave 40% for the OS + page cache
THREADS=$(( CORES / N )); [ "$THREADS" -ge 1 ] || THREADS=1
MEM=$(( MEM_BUDGET_GB / N )); [ "$MEM" -ge 1 ] || MEM=1
WORK=$(mktemp -d /tmp/cmp_shard_XXXX)
i=0
for d in "$OUT"/*/; do
  q=$(basename "$d")
  s=$(( i % N ))
  mkdir -p "$WORK/s$s"
  ln -s "$(readlink -f "$d")" "$WORK/s$s/$q"
  i=$((i+1))
done
pids=()
for s in $(seq 0 $((N-1))); do
  [ -d "$WORK/s$s" ] || continue
  cp "$OUT/oracle_sql.json" "$WORK/s$s/"
  DUCK_THREADS=$THREADS DUCK_MEM="${MEM}GB" DUCK_SPILL="/tmp/duck_spill_$s" \
    python3 scripts/compare.py "$SF" "$WORK/s$s" > "$WORK/s$s.log" 2>&1 &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=1; done
PASS=0; FAIL=0; RO=0
for s in $(seq 0 $((N-1))); do
  [ -f "$WORK/s$s.log" ] || continue
  echo "shard $s: $WORK/s$s.log"
  line=$(grep "^SUMMARY:" "$WORK/s$s.log" || echo "SUMMARY: 0 pass, 1 fail, 0 rows-only (no summary: shard crashed)")
  echo "  $line"
  # Validate each extracted field is numeric before arithmetic — a
  # malformed SUMMARY line must count as a failed shard, not abort the
  # whole accounting loop under set -e.
  p=$(echo "$line" | sed -nE 's/^SUMMARY: ([0-9]+) pass.*/\1/p')
  f=$(echo "$line" | sed -nE 's/.* ([0-9]+) fail.*/\1/p')
  r=$(echo "$line" | sed -nE 's/.* ([0-9]+) rows-only.*/\1/p')
  case "$p" in (''|*[!0-9]*) echo "  (unparseable summary; counting shard as failed)"; p=0; f=1; r=0; rc=1;; esac
  case "$f" in (''|*[!0-9]*) f=1; rc=1;; esac
  case "$r" in (''|*[!0-9]*) r=0;; esac
  PASS=$(( PASS + p ))
  FAIL=$(( FAIL + f ))
  RO=$(( RO + r ))
done
echo "COMBINED SUMMARY: $PASS pass, $FAIL fail, $RO rows-only"
exit $rc
