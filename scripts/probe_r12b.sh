#!/bin/bash
# Round-12 probe, stage 2 (the N=100 stage already ran — detail at
# /tmp/probe_r12_n100_s320_all.json, zero failures at 48g heap):
# N=300 and N=1000 under the spill-aware rule (SIZED partitions =
# 32 * max(1, N/10); heap sized with the data — x_semantic_dedup at
# N=100 OOMs the canonical 8g from the GCLocker edge, measured).
#
# Exclusions, from THIS session's measured N=100 times:
# - x_semantic_dedup (762 s at N=100): its documented Theta(n^1.5)
#   bound (fit_scaling EXPECTED) projects ~80 min at N=300 and ~8 h at
#   N=1000 for a single run — out of probe budget BY THE DOCUMENTED
#   BOUND ITSELF; the fresh N=100 point extends its measured ladder.
# - x_hits at N=1000 only (279 s at N=100, ~linear in the probe
#   range): projects ~45 min; runs at N=300.
set -e -o pipefail
cd "$(dirname "$0")/.."
N300Q=${PROBE_Q300:-x_dedup_unified,x_unified_survivors,x_ivfpq,x_bpe_train,x_substring_sweep,x_hits,x_ndcg}
N1000Q=${PROBE_Q1000:-x_dedup_unified,x_unified_survivors,x_ivfpq,x_bpe_train,x_substring_sweep,x_ndcg}
OUT=${PROBE_OUT:-SCALING_r12.json}
MEM=${PROBE_MEM:-48g}
ARGS="100:/tmp/probe_r12_n100_s320_all.json"

run_bench() { # N dir shuffle queries tag
  local n=$1 dir=$2 shuf=$3 queries=$4 tag=$5
  local detail="/tmp/probe_r12_n${n}_s${shuf}_${tag}.json"
  echo "=== N=$n shuffle=$shuf $tag ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$queries" \
    SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf SPARK_GRAFT_BENCH_DETAIL="$detail" \
    SPARK_DRIVER_MEM=$MEM \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" \
      > "/tmp/probe_r12_n${n}_${tag}.log" 2>&1 || true
  grep '"metric":"total"' "/tmp/probe_r12_n${n}_${tag}.log" | tail -1
  grep 'FAILED' "/tmp/probe_r12_n${n}_${tag}.log" | head -5 || true
  ARGS="$ARGS $n:$detail"
}

amp() { # N dir
  local n=$1 dir=$2
  if [ ! -d "$dir" ]; then
    SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 $dir $n" 2>&1 | tail -1
  fi
}

amp 300 /tmp/amp_r12_300
run_bench 300 /tmp/amp_r12_300 960 "$N300Q" all

amp 1000 /tmp/amp_r12_1000
run_bench 1000 /tmp/amp_r12_1000 3200 "$N1000Q" no_hits

python3 scripts/fit_scaling.py "$OUT" $ARGS
echo "probe_r12b done"
