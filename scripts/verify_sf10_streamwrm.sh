#!/bin/bash
# The stream_*/wrm_* sf10 correctness gate — closes the last 16-row scale
# asymmetry (VERDICT r14 item 2): CORRECTNESS_sf10_full covered the 152
# non-md5 queries and verify_sf10_md5.sh the 31 md5-family ones; the 8
# stream_* rows (real Structured Streaming runs) and 8 wrm_* rows (the
# reference's own fixture pipeline) were never gated above fixture scale.
#
#   scripts/verify_sf10_streamwrm.sh [outDir]
#
# - stream_* rows run their REAL streaming engines (fresh checkpoints,
#   RocksDB-backed state where pinned) against the tmp/sf10 corpus — 100×
#   the graded scale — and are hash-compared against the same batch-SQL
#   DuckDB oracles as at sf0.01.
# - wrm_* rows run under SPARK_GRAFT_WRM_SCALE=100: the raw-snapshot
#   fixture grows 100× (10× snapshot files per date × 10× stations per
#   snapshot — density growth, same philosophy as graft.ScaleUp), the
#   whole parse→validate→enhance pipeline executes at that scale, and the
#   oracle reads the scaled enhanced dump.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/v_sf10_sw}"
SF10=tmp/sf10
QUERIES=stream_doc_dedup,stream_token_topk,stream_source_cards,stream_quality_gate,stream_hourly_window,stream_latest_per_user,stream_purchase_view_join,stream_session_window,wrm_failures_csv,wrm_pipeline_enhanced,wrm_latest_per_station,wrm_station_daily_summary,wrm_bike_movement,wrm_density_grid,wrm_top10_recent,wrm_per_file_counts
if [ ! -d "$SF10" ]; then
  # single pass x100 — see verify_sf10_md5.sh / ScaleUp.assertStrideFits
  echo "[verify_sf10_streamwrm] generating $SF10 (ScaleUp x100 of sf0.1, single pass)..."
  SPARK_DRIVER_MEM=24g scripts/run.sh graft.ScaleUp /root/testdata/sf0.1 "$SF10" 100
fi
SPARK_DRIVER_MEM=24g SPARK_GRAFT_WRM_SCALE=100 \
  scripts/run.sh graft.Verify "$SF10" "$OUT" "$QUERIES"
SPARK_GRAFT_WRM_SCALE=100 python3 scripts/compare.py "$SF10" "$OUT"
