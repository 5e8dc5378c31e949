#!/bin/bash
# Round-16 scale legs — the two r15-verdict claims that still needed
# numbers after the code landed:
#   core_*       — delta-scheduled coreness (Graph.coreness, r15 verdict
#                  #4): SPARK_GRAFT_SYNC_COMPARE=1 makes every leg a full
#                  schedule × join-path 2×2 (core_s = the default, which
#                  stayed broadcastVertexCeiling=10M — full-broadcast at
#                  these leg sizes, the 2M-hybrid experiment was reverted
#                  / core_shuffle_s = all-shuffle /
#                  core_sync_s = the r15 default config, reproducing its
#                  rows / core_sync_shuffle_s), all checksum-equal
#                  in-run. TWO graph shapes: the ring of 8-cliques (8M
#                  vertices — ONE effective round, the scheduling's
#                  worst case) and the binary tree (2M vertices —
#                  ~20 peel rounds with a geometrically shrinking
#                  frontier, the shape the schedule exists for). Each leg
#                  runs 3 REPS (core_*_run{1,2,3}.json) and SCALING.md
#                  quotes per-field MINIMA — this box's ambient swing is
#                  5-10x (same-config legs measured 46 s and 177 s an
#                  hour apart); single runs are not comparable.
#                  Analytic histograms ({7: 8N} ring / {1: N} tree) and
#                  checksums asserted in-run at every leg.
#   ccstore_*    — v1 full-label-rewrite vs v2 delta-label store
#                  (CcStoreBench, r15 verdict #1): fixed 3-epoch delta,
#                  corpus inflated 1x/10x/100x by in-Scala salted
#                  replicas; v1's per-epoch label write must grow with
#                  the corpus while v2's stays delta-sized. The in-run
#                  gate requires v1 == v2 labels (count + checksum).
# Run from a SEPARATE clone (REPO=...) while developing — each sbt
# invocation compiles the working tree it runs in.
set -u
REPO=${REPO:-/root/repo}
cd "$REPO"
OUT=${1:-/tmp/scale_sweep_r16}
mkdir -p "$OUT"

runm() { # runm <tag> <main> <timeout_s> [heap] [env k=v ...]
  local tag=$1 main=$2 to=$3 mem=${4:-8g}; shift 4 || shift $#
  echo "=== $tag (graft.$main, $mem, $*) ==="
  env SPARK_GRAFT_SF_DIR=${SFDIR:-/root/testdata/sf0.1} SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM="$mem" "$@" \
    timeout "$to" sbt -batch "runMain graft.$main" \
    2>"$OUT/$tag.err" | grep '"metric"' > "$OUT/$tag.json"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" = 124 ]; then
    echo "{\"dnf_timeout_s\": $to}" > "$OUT/$tag.json"
  elif [ "$rc" != 0 ]; then
    # a failed leg must never leave timings a sweep-table grep could quote
    echo "{\"failed_rc\": $rc}" > "$OUT/$tag.json"
  fi
  echo "rc=$rc tail:"; cat "$OUT/$tag.json"
}

runm ccstore_repl1   CcStoreBench 1800 8g  SPARK_GRAFT_LABEL_REPL=1
runm ccstore_repl10  CcStoreBench 3600 8g  SPARK_GRAFT_LABEL_REPL=10
runm ccstore_repl100 CcStoreBench 7200 48g SPARK_GRAFT_LABEL_REPL=100

for i in 1 2 3; do
  runm core_synth8m_2x2_run$i CorenessBench 1800 48g \
    SPARK_GRAFT_SYNTH_CLIQUES=1000000 SPARK_GRAFT_CORE_PARTS=8 \
    SPARK_GRAFT_SYNC_COMPARE=1
done
for i in 1 2 3; do
  runm core_tree2m_2x2_run$i CorenessBench 1800 48g \
    SPARK_GRAFT_SYNTH_TREE=2097151 SPARK_GRAFT_CORE_PARTS=8 \
    SPARK_GRAFT_SYNC_COMPARE=1
done

echo "=== r16 sweep done ==="
