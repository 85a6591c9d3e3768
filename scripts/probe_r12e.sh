#!/bin/bash
# Round-12 probe, stage 5 (runs after probe_r12d on a quiet box):
#  - x_semantic_dedup at N=1000: the packed kernel moved its measured
#    probe-range exponent from ~1.7 to ~0.9 (N=100: 762 s exploded ->
#    23.3 s packed; N=300: 61.9 s), so the decade the r12b script
#    excluded BY THE OLD BOUND'S PROJECTION (~8 h/run) is now
#    affordable and the SemDeDup composite gets a measured ~16 GB
#    point.
#  - N=30/100 ladders for the round's two new queries
#    (x_kendall_tau, x_mmr_rerank) — every new family gets measured
#    scale evidence, not an argued shape.
set -e -o pipefail
cd "$(dirname "$0")/.."
MEM=${PROBE_MEM:-48g}

run_bench() { # N dir shuffle queries tag
  local n=$1 dir=$2 shuf=$3 queries=$4 tag=$5
  local detail="/tmp/probe_r12e_n${n}_s${shuf}_${tag}.json"
  echo "=== N=$n shuffle=$shuf $tag ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$queries" \
    SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf SPARK_GRAFT_BENCH_DETAIL="$detail" \
    SPARK_DRIVER_MEM=$MEM \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" \
      > "/tmp/probe_r12e_n${n}_${tag}.log" 2>&1 || true
  grep '"metric":"total"' "/tmp/probe_r12e_n${n}_${tag}.log" | tail -1
  grep 'FAILED' "/tmp/probe_r12e_n${n}_${tag}.log" | head -5 || true
}

if [ ! -d /tmp/amp_r12_30 ]; then
  SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 /tmp/amp_r12_30 30" 2>&1 | tail -1
fi

run_bench 30   /tmp/amp_r12_30   96  "x_kendall_tau,x_mmr_rerank" new
run_bench 100  /tmp/amp_r12_100  320 "x_kendall_tau,x_mmr_rerank" new
run_bench 1000 /tmp/amp_r12_1000 960 "x_semantic_dedup" sem
# x_ndcg read 1.43 at the s960-only N=1000 point (67.0 s vs 12.0 at
# N=300) — probe the partition envelope before grading it: the
# brute-truth side sorts per-query partitions whose width grows
# linearly, exactly the shape partition sizing moves.
run_bench 1000 /tmp/amp_r12_1000 320  "x_ndcg" ndcg320
run_bench 1000 /tmp/amp_r12_1000 3200 "x_ndcg" ndcg3200

echo "probe_r12e done"
