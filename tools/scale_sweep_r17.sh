#!/bin/bash
# Round-17 scale legs — re-measure the coreness schedule × join-path 2×2
# after the frontier-local round rewrite (r16 verdict #3: the per-round
# fixed-cost floor). Same legs, reps, and in-run checksum/eval-count
# gates as tools/scale_sweep_r16.sh, so the artifacts are directly
# comparable row-for-row:
#   core_tree2m_* — the ~20-round geometric-peel shape the delta
#                   schedule exists for; r16 minima: core_s 72.97 (and
#                   an idle re-run measured 64.67) vs core_sync_s 55.88
#                   — the delta schedule did 16.8x less work yet lost
#                   on wall-clock to its own fixed cost (two |V|-row
#                   broadcast builds + a second full edge scan every
#                   round). The frontier-local rewrite drops those; the
#                   claim to verify here is core_s beating BOTH its own
#                   r16 minimum by ~2x AND the sync legs, with
#                   bit-identical checksums and eval counts.
#   core_synth8m_* — the one-effective-round ring (scheduling's worst
#                    case): nothing to win, must not regress.
# Reps × per-field minima, as in r16 — this box's ambient swing is
# 5-10x; single runs are not comparable.
set -u
REPO=${REPO:-/root/repo}
cd "$REPO"
OUT=${1:-/tmp/scale_sweep_r17}
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

for i in 1 2 3; do
  runm core_tree2m_2x2_run$i CorenessBench 1800 48g \
    SPARK_GRAFT_SYNTH_TREE=2097151 SPARK_GRAFT_CORE_PARTS=8 \
    SPARK_GRAFT_SYNC_COMPARE=1
done
for i in 1 2 3; do
  runm core_synth8m_2x2_run$i CorenessBench 1800 48g \
    SPARK_GRAFT_SYNTH_CLIQUES=1000000 SPARK_GRAFT_CORE_PARTS=8 \
    SPARK_GRAFT_SYNC_COMPARE=1
done

echo "=== r17 sweep done ==="
