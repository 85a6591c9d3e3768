#!/bin/bash
# Round-10 scale probe: amplify sf0.1 N-fold, time the ten r10 queries
# per N under the two shuffle-partition configs (32 fixed, and SIZED
# 32*max(1, N/10)), then fit exponents -> SCALING_r10.json.
# Protocol identical to the r9 probe (BASELINE.md "Round 9: measured
# scaling exponents"): envelope MIN per (query, N), discarded warm-up,
# medians over SPARK_GRAFT_BENCH_RUNS.
set -e -o pipefail
cd "$(dirname "$0")/.."
QUERIES=${PROBE_QUERIES:-x_macd,x_stochastic,x_sharpe,x_beta,x_obv,x_regr_trend,x_cusum,x_kaplan_meier,x_local_cc,x_link_predict,x_moments,x_eigencentrality,x_waiting_suppliers}
NS=${PROBE_NS:-"3 10 30 100"}
RUNS=${PROBE_RUNS:-2}
OUT=${PROBE_OUT:-SCALING_r10.json}
ARGS=""

run_bench() { # N dir shuffle
  local n=$1 dir=$2 shuf=$3
  local detail="/tmp/probe_r10_n${n}_s${shuf}.json"
  echo "=== N=$n shuffle=$shuf ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_RUNS=$RUNS SPARK_GRAFT_BENCH_WARMUP=1 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf SPARK_GRAFT_BENCH_DETAIL="$detail" \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 | tail -2
  ARGS="$ARGS $n:$detail"
}

run_bench 1 /root/testdata/sf0.1 32
for n in $NS; do
  dir="/tmp/amp_r10_$n"
  if [ ! -d "$dir" ]; then
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 $dir $n" 2>&1 | tail -1
  fi
  run_bench "$n" "$dir" 32
  sized=$((32 * (n > 10 ? n / 10 : 1)))
  if [ "$sized" -ne 32 ]; then run_bench "$n" "$dir" "$sized"; fi
done

python3 scripts/fit_scaling.py "$OUT" $ARGS
