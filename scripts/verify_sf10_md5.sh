#!/bin/bash
# The md5-family sf10 correctness gate — closes the one scale asymmetry
# left after CORRECTNESS_sf10_full.json (round 13): the 31 md5-mode
# dedup/vector/sampling queries, hash-compared against DuckDB at sf10 =
# 100x the graded scale.
#
#   scripts/verify_sf10_md5.sh [outDir] [stageDir]
#
# 26 of the 31 run the FULL all-DuckDB oracle (triage at sf10: every one
# completes in <= 130 s; the q80 dominance scan needed the lossless
# angular pre-filter, commit 1524f24). The four MinHash shingle-chain
# queries (q26/q50/q51/q55) and q80 run in STAGED mode
# (SPARK_GRAFT_STAGE_DIR): the engine persists the signature/assignment
# intermediate once and the oracle re-runs everything downstream of it —
# banding, bucket caps, candidate joins, exact-Jaccard verification,
# transitive clustering (for q80: quantized centroids + dominance scan;
# its corpus-scaled nClusters makes the n·k argmax intractable for
# DuckDB's per-element lambdas at sf10 — ~0.14M cosine pairs/s measured
# → ~30 min for that CTE alone). Every full chain, including the
# staged-away upstream, is hash-verified at sf0.01/sf0.1/sf1 by the
# regular gates, and the staged downstream SQL is shared verbatim with
# the full oracle's (see StagedOracle's scaladoc).
#
# Expect ~25 min for the Spark side and ~15 min for the DuckDB side.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/v_sf10_md5}"
STAGE="${2:-/tmp/stage_sf10_md5}"
SF10=tmp/sf10
MD5Q=q118_dataset_split,q126_knn_graph,q127_weighted_sample,q136_dedup_report,q148_source_novelty,q157_entity_resolution,q165_bootstrap_ci,q169_filter_cascade,q16_string_funcs,q170_shard_balance,q174_sql_functions,q179_corpus_card,q180_negative_sampling,q20_exact_dedup,q26_minhash_lsh_dedup,q27_simhash,q29_ann_lsh,q30_embedding_dedup,q38_ivf_build,q47_stratified_sample,q50_minhash_canonical,q51_dedup_clusters,q52_simhash_dedup,q53_corpus_curation,q55_source_sketch,q56_embedding_canonical,q67_corpus_shuffle,q69_random_projection,q80_semantic_dedup,q82_exact_sample,q96_mixture_resample
if [ ! -d "$SF10" ]; then
  # ONE pass, replicas=100 — composing x10 of an x10 output collides the
  # replica key offsets (i+j sums) and mints duplicate keys; ScaleUp now
  # fails loud on such input (see assertStrideFits, round-15 post-mortem)
  echo "[verify_sf10_md5] generating $SF10 (ScaleUp x100 of sf0.1, single pass)..."
  SPARK_DRIVER_MEM=24g scripts/run.sh graft.ScaleUp /root/testdata/sf0.1 "$SF10" 100
fi
SPARK_DRIVER_MEM=24g SPARK_GRAFT_STAGE_DIR="$STAGE" \
  scripts/run.sh graft.Verify "$SF10" "$OUT" "$MD5Q"
python3 scripts/compare.py "$SF10" "$OUT"
