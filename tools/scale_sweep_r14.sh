#!/bin/bash
# Round-14 scale legs: the bucket-pruned incremental-CC posting probe
# (r13 verdict #2) measured in BOTH ingest regimes at 1x/10x/100x:
#   iC   IncCcBench, default ~1k-doc batch (~23k distinct shingle keys —
#        SATURATES the bucket set; step_pruned_s documents that pruning
#        costs nothing even when it cannot help).
#   iCs  IncCcBench, SPARK_GRAFT_BATCH_CAP=250 (50-doc batch, ~1.4k keys
#        — the continuous-ingest regime where the pruned probe reads only
#        the batch's bucket dirs; the delta-sized-step demonstration).
# Bucket count auto-scales with corpus postings (~3k rows/bucket), so
# rows-per-bucket is constant across the decades — the law that makes the
# pruned probe O(|batch keys|) at any corpus size.
# Corpora from tools/make_stress_corpus.py:
#   python3 tools/make_stress_corpus.py textsalt /tmp/sf10salt 10
#   python3 tools/make_stress_corpus.py textsalt /tmp/sf100x   100
# Run from a git CLONE (REPO=<clone>), never the working repo: bash reads
# scripts incrementally and sbt target/ locks collide with a live session.
set -u
REPO=${REPO:?set REPO=<git clone of /root/repo> (never the working repo)}
cd "$REPO"
OUT=${1:-/tmp/scale_sweep_r14}
mkdir -p "$OUT"

runm() { # runm <tag> <main> <sfdir> <timeout_s> [heap] [batch_cap]
  local tag=$1 main=$2 sfdir=$3 to=$4 mem=${5:-8g} cap=${6:-}
  echo "=== $tag ($main @ $sfdir, $mem, cap=${cap:-none}) ==="
  # env (not bare prefix assignments): an assignment produced by ${cap:+...}
  # expansion is NOT recognized as one by bash — it becomes the command word
  # and the leg dies with 127. env takes assignments as arguments, so the
  # conditional cap composes.
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="$mem" \
    ${cap:+SPARK_GRAFT_BATCH_CAP=$cap} \
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

runm iCs_1x   IncCcBench /root/testdata/sf0.1 1800 8g  250
runm iCs_10x  IncCcBench /tmp/sf10salt        3600 8g  250
runm iC_1x    IncCcBench /root/testdata/sf0.1 1800
runm iC_10x   IncCcBench /tmp/sf10salt        3600
# the heaviest legs last: 100x prep re-runs full-corpus pairing + CC
runm iCs_100x IncCcBench /tmp/sf100x          7200 48g 250
runm iC_100x  IncCcBench /tmp/sf100x          7200 48g

# coreness scale law (SCALING.md graph section): fixpoint flat vs 100x
# edge growth; histogram linearity + max_core invariance are the
# cross-scale correctness checks
runm core_1x   CorenessBench /root/testdata/sf0.1 1800
runm core_10x  CorenessBench /tmp/sf10salt        3600
runm core_100x CorenessBench /tmp/sf100x          7200 48g

echo "=== r14 sweep done ==="
