#!/bin/bash
# Round-19 scale legs — the r18 verdict's #2/#3 measured:
#   core_tree2m_*  — the geometric peel with the AUTO-default schedule
#                    (coreness/corenessBucketed now default auto) and the
#                    v-SORTED bucketed layout + pushed frontier id-range
#                    (rowgroup/page pruning WITHIN hit files): the
#                    artifact's bucketed_scan_rounds now records
#                    per-round [round, files, hit buckets, ROWS READ] —
#                    mid-width rounds (files == all B) must show rows
#                    dropping toward the 1-page-per-hit-file floor.
#                    B=1024 for r18 comparability; a B=32 leg shows the
#                    within-file prune where files stay wide longer.
#   core_ring8m_*  — the one-effective-round ring (delta's worst case):
#                    auto must stay sync; regression gate vs r18.
# Reps x per-field minima, as in r16-r18 — this box's ambient swing is
# 5-10x; single runs are not comparable.
set -u
REPO=${REPO:-/root/repo}
cd "$REPO"
OUT=${1:-bench/scale_sweep_r19}
mkdir -p "$OUT"

runm() { # runm <tag> <timeout_s> <mem> [env k=v ...]
  local tag=$1 to=$2 mem=$3; shift 3
  echo "=== $tag ($mem, $*) ==="
  env SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM="$mem" "$@" \
    timeout "$to" sbt -batch "runMain graft.CorenessBench" \
    2>"$OUT/$tag.err" | grep '"metric"' > "$OUT/$tag.json"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" = 124 ]; then
    echo "{\"dnf_timeout_s\": $to}" > "$OUT/$tag.json"
    # timeout SIGTERMs sbt; the FORKED bench JVM (run/fork := true) can
    # survive as an orphan and skew the next rep's timings — reap it
    pkill -f "graft.CorenessBench" 2>/dev/null || true
    sleep 5
  elif [ "$rc" != 0 ]; then
    # a failed leg must never leave timings a sweep-table grep could quote
    echo "{\"failed_rc\": $rc}" > "$OUT/$tag.json"
  elif [ ! -s "$OUT/$tag.json" ]; then
    # sbt exited 0 but no metric line reached stdout (e.g. a require()
    # kill swallowed by the logger) — flag it, don't read as missing data
    echo "{\"failed_no_metric\": true}" > "$OUT/$tag.json"
  fi
}

for i in 1 2 3; do
  runm "core_tree2m_run$i" 1800 8g \
    SPARK_GRAFT_SYNTH_TREE=2097151 SPARK_GRAFT_SYNC_COMPARE=1 \
    SPARK_GRAFT_AUTO_COMPARE=1 SPARK_GRAFT_EDGE_BUCKETS=1024
done
# the mid-width within-file prune leg: B=32 keeps every bucket hit for
# most of the peel (files == 32 throughout the wide regime), so the
# rows-read column isolates the pushed v-range's rowgroup/page pruning
for i in 1 2; do
  runm "core_tree2m_b32_run$i" 1800 8g \
    SPARK_GRAFT_SYNTH_TREE=2097151 SPARK_GRAFT_EDGE_BUCKETS=32
done
for i in 1 2; do
  runm "core_ring8m_run$i" 1800 32g \
    SPARK_GRAFT_SYNTH_CLIQUES=1000000 SPARK_GRAFT_SYNC_COMPARE=1 \
    SPARK_GRAFT_AUTO_COMPARE=1
done
echo DONE
