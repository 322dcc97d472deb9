#!/bin/bash
# Reproduces the round-12 sf1 correctness gate: the strict DuckDB-oracle
# compare at one decade above the driver's bench scale, over the FULL
# 199-query registry (all 199 verified green at sf1 in round 12).
#
#   scripts/verify_sf1.sh [outDir] [subset]
#
# Regenerates tmp/sf1 with graft.ScaleUp if absent (ALWAYS regenerate it
# after a ScaleUp change — a stale corpus fakes superlinearity, see
# SCALE.md's round-12 post-mortem). Expect ~10 min for the Spark side and
# ~30-40 min for the DuckDB side (the md5-mode shingle transliterations
# cost minutes each at sf1 even with their CTEs materialized; q55 is the
# longest at ~5 min). Pass a comma-separated subset as $2 to iterate on
# specific queries, or "--all-except:<names>" to exclude.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/v_sf1}"
SUBSET="${2:-}"
SF1=tmp/sf1
if [ ! -d "$SF1" ]; then
  echo "[verify_sf1] generating $SF1 (ScaleUp x10 of sf0.1)..."
  SPARK_DRIVER_MEM=16g scripts/run.sh graft.ScaleUp /root/testdata/sf0.1 "$SF1" 10
fi
SPARK_DRIVER_MEM=24g scripts/run.sh graft.Verify "$SF1" "$OUT" $SUBSET
python3 scripts/compare.py "$SF1" "$OUT"
