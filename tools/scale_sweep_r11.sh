#!/bin/bash
# Round-11 scale legs on top of tools/scale_sweep.sh's corpora and run()
# discipline (same env knobs, same DNF recording). Families:
#   bL  lifecycle + maintenance composites: q230 (two-level persist→append→
#       search), q232 (incremental CC), q233 (streaming ingest screen) —
#       the r10-verdict ask: the lifecycle must run in the two-level build's
#       30 s class at 100×, not the flat path's 284–346 s class.
#   b7  q228 two-level-vs-flat dedup agreement at 10×/100× — the routing
#       approximation measured in the regime it exists for (it re-runs the
#       flat n² assignment as its own truth side, so the 100× leg is
#       budgeted like q222's 740 s flat leg).
#   b8  q118 (memory-sink EWMA) vs q234 (distributed-parquet-sink EWMA)
#       side by side — the direct proof of SCALING.md's q118 decomposition.
#   b9  BucketedBench: shuffle vs exchange-free bucketed fact-fact join at
#       1×/100× (its JSON is self-contained; not a Bench line).
# Corpora from tools/make_stress_corpus.py (see scale_sweep.sh header).
set -u
REPO=${REPO:-/root/repo}
cd "$REPO"
OUT=${1:-/tmp/scale_sweep_r11}
mkdir -p "$OUT"

run() { # run <tag> <sfdir> <only> <timeout_s> [heap]
  local tag=$1 sfdir=$2 only=$3 to=$4 mem=${5:-8g}
  echo "=== $tag ($only @ $sfdir, $mem) ==="
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_ONLY=$only SPARK_GRAFT_REPS=1 \
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem timeout "$to" \
    sbt -batch "runMain graft.Bench" 2>"$OUT/$tag.err" | tail -2 > "$OUT/$tag.json"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" = 124 ]; then
    echo "{\"dnf_timeout_s\": $to}" > "$OUT/$tag.json"
  fi
  echo "rc=$rc tail:"; cat "$OUT/$tag.json"
}

runbb() { # runbb <tag> <sfdir> <timeout_s> [heap]
  local tag=$1 sfdir=$2 to=$3 mem=${4:-8g}
  echo "=== $tag (BucketedBench @ $sfdir, $mem) ==="
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$mem \
    timeout "$to" sbt -batch "runMain graft.BucketedBench" \
    2>"$OUT/$tag.err" | grep '"metric"' > "$OUT/$tag.json"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" = 124 ]; then
    echo "{\"dnf_timeout_s\": $to}" > "$OUT/$tag.json"
  elif [ "$rc" != 0 ]; then
    # BucketedBench prints its metric JSON BEFORE the rows_match/exchange
    # gate exits 1 — a gated-out leg's timings must not be quotable by
    # sweep_table (ADVICE r11)
    echo "{\"failed_rc\": $rc}" > "$OUT/$tag.json"
  fi
  echo "rc=$rc tail:"; cat "$OUT/$tag.json"
}

run bL_1x   /root/testdata/sf0.1 q230,q232,q233 1200
run b7_1x   /root/testdata/sf0.1 q228           1200
run b8_1x   /root/testdata/sf0.1 q118,q234      1200
runbb b9_1x /root/testdata/sf0.1 1200

run bL_10x  /tmp/sf10salt        q230,q232,q233 2400
run b7_10x  /tmp/sf10salt        q228           2400
run b8_10x  /tmp/sf10rel         q118,q234      2400

run bL_100x /tmp/sf100x          q230,q232,q233 5400 48g
run b8_100x /tmp/sf100rel        q118,q234      5400 48g
runbb b9_100x /tmp/sf100rel      5400 48g
# the q228 100x leg re-runs the flat n² assignment as its truth side — the
# most expensive leg by design; run it dead last (q222's 740 s class)
run b7_100x /tmp/sf100x          q228           5400 48g

echo "=== r11 sweep done ==="
