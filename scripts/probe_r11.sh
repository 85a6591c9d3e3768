#!/bin/bash
# Round-11 probe: the 17 queries added in r11 (hypothesis tests,
# DMI/ADX-family indicators, Adamic-Adar, NDCG, Gopher census, AMS F2,
# Q6), measured under the r9 protocol (envelope MIN over
# shuffle-partition configs; discarded warm-up; fit with
# scripts/fit_scaling.py -> SCALING_r11.json).
#
# HEAVY = per-tick rank windows / wedge joins / QI-grid fans (real
# per-row work at sf0.1) probe to N=30; CHEAP bounded aggregates and
# fixed-query-set evals go to N=100.
set -e -o pipefail
cd "$(dirname "$0")/.."
HEAVY=${PROBE_HEAVY:-x_spearman,x_mann_whitney,x_tcloseness,x_ra_link,x_adx,x_coppock,x_elder_ray,x_page_hinkley,x_media_dhash,x_ljung_box,x_tick_imbalance}
CHEAP=${PROBE_CHEAP:-x_welch_t,x_chi_square,x_dpo,x_omega,x_pain_index,x_treynor,x_ndcg,x_gopher_rules,x_ams_f2,x_forecast_revenue,x_kruskal_wallis,x_jarque_bera,x_dp_release,x_sax_motifs}
RUNS=${PROBE_RUNS:-1}
OUT=${PROBE_OUT:-SCALING_r11.json}
ARGS=""

run_bench() { # N dir shuffle queries tag
  local n=$1 dir=$2 shuf=$3 queries=$4 tag=$5
  local detail="/tmp/probe_r11_n${n}_s${shuf}_${tag}.json"
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
