#!/bin/bash
# Generalized same-session A/B of one bench row against a prior-round
# checkout (the q05/q01/q62 protocol): build the reference tree in a
# worktree, then measure HEAD -> ref -> HEAD back-to-back on the same
# box so any residual difference is code, not box state. The sandwich
# (HEAD twice) makes within-session drift visible in the output itself.
#
#   scripts/ab_row.sh <query> [sfdir=tmp/sf10] [ref=ddd77e5] [wt=tmp/wt_<ref>]
#
# e.g. scripts/ab_row.sh q165_bootstrap_ci tmp/sf10 257d677
set -e
cd "$(dirname "$0")/.."
Q="${1:?query name required}"
SF="$(readlink -f "${2:-tmp/sf10}")"
REF="${3:-ddd77e5}"
WT="${4:-tmp/wt_${REF}}"

if [ ! -d "$WT" ]; then
  git worktree add "$WT" "$REF"
fi
echo "[ab] compiling $REF worktree..."
(cd "$WT" && sbt -batch compile >/dev/null)

run() {  # run <dir> <out>
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$Q" \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_OUT="$2" SPARK_DRIVER_MEM=64g \
    scripts/run.sh graft.Bench 2>/dev/null | tail -1)
}
echo "[ab] HEAD pass 1..."
run . "/tmp/ab_${Q}_head1.json"
echo "[ab] $REF pass..."
run "$WT" "/tmp/ab_${Q}_ref.json"
echo "[ab] HEAD pass 2..."
run . "/tmp/ab_${Q}_head2.json"

python3 - "$Q" "$REF" <<'EOF'
import json, sys
q, ref = sys.argv[1], sys.argv[2]
def v(p):
    try:
        return json.load(open(p))["queries"].get(q)
    except Exception:
        return None
h1, r, h2 = (v(f"/tmp/ab_{q}_{t}.json") for t in ("head1", "ref", "head2"))
print(f"[ab] {q} {sys.argv[0]}: HEAD={h1}s  {ref}={r}s  HEAD(again)={h2}s")
EOF
