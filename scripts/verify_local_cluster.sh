#!/bin/bash
# Registry smoke under local-cluster — REAL executor JVMs (VERDICT r16
# item 4): local[n] runs every task in the driver process, so task
# closure serialization and broadcast values (NearestCentroid /
# CandidateCells centroid matrices, Misra-Gries buffers, GramMatrix)
# never cross a process boundary there. One sf0.001 sweep under
# local-cluster[2,8,4096] catches exactly that class of
# driver-assumption bug, then the DuckDB compare re-checks every hash.
#
#   scripts/verify_local_cluster.sh [outDir]
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/root/repo/tmp/v_localcluster}"
rm -rf "$OUT"
sbt -batch package   # executors load app classes from the packaged jar
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER="local-cluster[2,8,4096]" SPARK_DRIVER_MEM=8g \
  scripts/run.sh graft.Verify /root/testdata/sf0.001 "$OUT"
python3 scripts/compare.py /root/testdata/sf0.001 "$OUT"
