#!/bin/bash
# Reproduces the round-12 sf1 correctness gate: the strict DuckDB-oracle
# compare at one decade above the driver's bench scale.
#
#   scripts/verify_sf1.sh [outDir]
#
# Regenerates tmp/sf1 with graft.ScaleUp if absent (ALWAYS regenerate it
# after a ScaleUp change — a stale corpus fakes superlinearity, see
# SCALE.md's round-12 post-mortem), runs graft.Verify over everything
# except the sf1-infeasible oracles, then scripts/compare.py. Exclusions
# are oracle-side cost walls, not engine failures — all are hash-green
# at sf0.001/0.01/0.1:
#   - the md5-mode shingle transliterations whose DuckDB side costs
#     minutes-to-hours at sf1 (q25/q26/q50/q51/q55/q84),
#   - q94_triangles, whose DuckDB CTE spills >60 GB of temp at sf1
#     (the Spark side runs it in ~5 s).
# q129/q165 are included — verified tractable (PASS) in round 12.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/v_sf1}"
SF1=tmp/sf1
if [ ! -d "$SF1" ]; then
  echo "[verify_sf1] generating $SF1 (ScaleUp x10 of sf0.1)..."
  SPARK_DRIVER_MEM=16g scripts/run.sh graft.ScaleUp /root/testdata/sf0.1 "$SF1" 10
fi
EXCL="q25_ngram_jaccard,q26_minhash_lsh_dedup,q50_minhash_canonical,q51_dedup_clusters,q55_source_sketch,q84_containment,q94_triangles"
SPARK_DRIVER_MEM=24g scripts/run.sh graft.Verify "$SF1" "$OUT" "--all-except:$EXCL"
python3 scripts/compare.py "$SF1" "$OUT"
