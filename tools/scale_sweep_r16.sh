#!/bin/bash
# Round-16 scale legs — the two r15-verdict claims that still needed
# numbers after the code landed:
#   core_synth*  — delta-scheduled coreness (Graph.coreness, r15 verdict
#                  #4): the ring-of-8-cliques at 2M/8M vertices re-run on
#                  the SAME synthetic graph as bench/scale_sweep_r15/
#                  core_synth{2m,8m}.json. parts8 legs hold
#                  SPARK_GRAFT_CORE_PARTS=8 — like-for-like vs the r15
#                  rows, isolating the scheduling gain; the plain legs use
#                  the new width default (= cpus), the production setting.
#                  The analytic histogram ({7: 8N}) and checksum are
#                  asserted in-run at every leg.
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

runm core_synth2m_parts8 CorenessBench 3600 48g \
  SPARK_GRAFT_SYNTH_CLIQUES=250000 SPARK_GRAFT_CORE_PARTS=8
runm core_synth8m_parts8 CorenessBench 7200 48g \
  SPARK_GRAFT_SYNTH_CLIQUES=1000000 SPARK_GRAFT_CORE_PARTS=8
runm core_synth8m        CorenessBench 7200 48g \
  SPARK_GRAFT_SYNTH_CLIQUES=1000000

echo "=== r16 sweep done ==="
