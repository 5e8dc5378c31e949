#!/bin/bash
# Round-18 scale legs — the r17 verdict's two structural residues closed:
#   core_tree2m_* — the ~20-round geometric peel, now with the ADAPTIVE
#                   schedule (SPARK_GRAFT_AUTO_COMPARE: starts sync,
#                   flips on 2*sumDeg(changed) < |V|) and the BUCKETED
#                   edge layout (SPARK_GRAFT_EDGE_BUCKETS=1024: probe
#                   pruned to the frontier's buckets at the scan; the
#                   artifact's bucketed_scan_rounds records per-round
#                   [files read, hit buckets] — the delta-READ-sized
#                   claim). Claims to verify: core_auto_s matches or
#                   beats min(core_s, core_sync_s); files == hit per
#                   frontier-local round, shrinking to 1; checksums
#                   bit-equal across ALL legs (in-run gates).
#   core_ring8m_* — the one-effective-round ring (delta's worst case):
#                   auto must stay sync (evals_auto == [8M, 8M]) and
#                   match core_sync_s. Needs SPARK_DRIVER_MEM=32g (the
#                   8g default OOMs building the 29M-edge ring).
# Reps x per-field minima, as in r16/r17 — this box's ambient swing is
# 5-10x; single runs are not comparable.
set -u
REPO=${REPO:-/root/repo}
cd "$REPO"
OUT=${1:-bench/scale_sweep_r18}
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
for i in 1 2; do
  runm "core_ring8m_run$i" 1800 32g \
    SPARK_GRAFT_SYNTH_CLIQUES=1000000 SPARK_GRAFT_SYNC_COMPARE=1 \
    SPARK_GRAFT_AUTO_COMPARE=1
done
echo DONE
