#!/bin/bash
# Round-10 third-wave probe: the 15 queries added in the r10c wave
# (Keltner/Vortex/CMO/force/Calmar/VR/TRIX/Theil-Sen/Roll/DOW
# indicators, personalized PageRank, JS divergence, readability,
# K-S lengths, embedding anisotropy), measured under the r9 protocol (envelope MIN
# over shuffle-partition configs; discarded warm-up; fit with
# scripts/fit_scaling.py -> SCALING_r10c.json).
#
# HEAVY = per-tick window / graph / pair-join / token-explode queries
# (real per-row work at sf0.1) probe to N=30; CHEAP aggregates
# (constant-dominated at probe sizes) go to N=100.
set -e -o pipefail
cd "$(dirname "$0")/.."
HEAVY=${PROBE_HEAVY:-x_variance_ratio,x_ppr,x_trix,x_theil_sen,x_roll_spread}
CHEAP=${PROBE_CHEAP:-x_keltner,x_vortex,x_cmo,x_force_index,x_calmar,x_js_sources,x_readability,x_emb_anisotropy,x_dow_effect,x_ks_lengths}
RUNS=${PROBE_RUNS:-1}
OUT=${PROBE_OUT:-SCALING_r10c.json}
ARGS=""

run_bench() { # N dir shuffle queries tag
  local n=$1 dir=$2 shuf=$3 queries=$4 tag=$5
  local detail="/tmp/probe_r10c_n${n}_s${shuf}_${tag}.json"
  echo "=== N=$n shuffle=$shuf $tag ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$queries" \
    SPARK_GRAFT_BENCH_RUNS=$RUNS SPARK_GRAFT_BENCH_WARMUP=1 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf SPARK_GRAFT_BENCH_DETAIL="$detail" \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric":"total"' | tail -1
  ARGS="$ARGS $n:$detail"
}

amp() { # N
  local dir="/tmp/amp_r10_$1"
  if [ ! -d "$dir" ]; then
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 $dir $1" 2>&1 | tail -1
  fi
  echo "$dir"
}

run_bench 1 /root/testdata/sf0.1 32 "$HEAVY,$CHEAP" all
for n in 3 10; do
  dir=$(amp $n | tail -1)
  run_bench "$n" "$dir" 32 "$HEAVY,$CHEAP" all
done
dir=$(amp 30 | tail -1)
run_bench 30 "$dir" 32 "$HEAVY,$CHEAP" all
run_bench 30 "$dir" 96 "$HEAVY,$CHEAP" all
dir=$(amp 100 | tail -1)
run_bench 100 "$dir" 32 "$CHEAP" cheap
run_bench 100 "$dir" 320 "$CHEAP" cheap

python3 scripts/fit_scaling.py "$OUT" $ARGS
