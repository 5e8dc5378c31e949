#!/bin/bash
# Round-13 scale legs: the two measurements round 12 built the instruments
# for and never fired (r12 verdict #1/#2).
#   iC  IncCcBench — fixed ~1k-doc ingest delta vs 1x/10x/100x textsalt
#       corpora. The q232 claim ("work per ingest scales with the delta,
#       not the corpus") predicts step_s flat-to-sublinear across the
#       decades while prep_s (the amortized one-time indexing) grows with
#       the corpus.
#   aS  AnnSearchBench — build_s / search_cold_s / search_warm_s /
#       s_per_query against a PERSISTED two-level IVF-PQ index at
#       1x/10x/100x (the production retrieval number; r11's only figure
#       was build-dominated).
# Corpora from tools/make_stress_corpus.py (textsalt replicas — linear
# true-dup regime; embeddings dim-rotated, so the vector side scales too).
# Run from a git CLONE (REPO=<clone>), never the working repo: bash reads
# scripts incrementally and sbt target/ locks collide with a live session.
# REPO therefore has NO default (ADVICE r13: defaulting to /root/repo
# contradicted the clone-only rule) — the caller must point it at a clone.
set -u
REPO=${REPO:?set REPO=<git clone of /root/repo> (never the working repo)}
cd "$REPO"
OUT=${1:-/tmp/scale_sweep_r13}
mkdir -p "$OUT"

runm() { # runm <tag> <main> <sfdir> <timeout_s> [heap]
  local tag=$1 main=$2 sfdir=$3 to=$4 mem=${5:-8g}
  echo "=== $tag ($main @ $sfdir, $mem) ==="
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
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

runm iC_1x   IncCcBench    /root/testdata/sf0.1 1800
runm iC_10x  IncCcBench    /tmp/sf10salt        3600
runm aS_1x   AnnSearchBench /root/testdata/sf0.1 1800
runm aS_10x  AnnSearchBench /tmp/sf10salt        3600
runm aS_100x AnnSearchBench /tmp/sf100x          5400 48g
# kmInit: k-means|| vs ++ seeding cost/quality at the same three scales
# (ADVICE r13: these legs were cited by SCALING.md but not reproducible
# from the script)
runm kmInit_1x   KmInitBench /root/testdata/sf0.1 1800
runm kmInit_10x  KmInitBench /tmp/sf10salt        3600
runm kmInit_100x KmInitBench /tmp/sf100x          5400 48g
# the heaviest leg last: 100x prep re-runs full-corpus pairing + CC
runm iC_100x IncCcBench    /tmp/sf100x          7200 48g

echo "=== r13 sweep done ==="
