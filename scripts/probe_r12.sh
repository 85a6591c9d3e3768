#!/bin/bash
# Round-12 probe: push the 8 most expensive composites past the N=100
# evidence ceiling to N=300 and N=1000 (~5 / ~17 GB amplified corpora)
# under the spill-aware partition rule (SIZED = 32 * max(1, N/10)).
# Fresh N=100 points are measured in THIS session so the 300->1000
# tail never mixes with another session's envelope.
#
# x_semantic_dedup runs to N=300 only: its DOCUMENTED Theta(n^1.5)
# bound (fit_scaling EXPECTED) projects ~3 h at N=1000 for one run —
# the bound is the claim, the N=300 point extends its evidence decade.
set -e -o pipefail
cd "$(dirname "$0")/.."
HEAVY8=${PROBE_Q:-x_dedup_unified,x_unified_survivors,x_ivfpq,x_bpe_train,x_substring_sweep,x_hits,x_ndcg,x_semantic_dedup}
N1000Q=${PROBE_Q1000:-x_dedup_unified,x_unified_survivors,x_ivfpq,x_bpe_train,x_substring_sweep,x_hits,x_ndcg}
OUT=${PROBE_OUT:-SCALING_r12.json}
ARGS=""

# Probe heap: the bench's 8g default is the canonical-suite setting;
# an N=1000 composite shuffles ~10x the N=100 state through the same
# JVM, and the spill-aware rule sizes MEMORY with the data exactly
# like partitions (x_semantic_dedup at N=100 OOMs an 8g heap from the
# GCLocker edge — measured this round). 48g on the 125g box.
MEM=${PROBE_MEM:-48g}

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

amp 100 /tmp/amp_r10_100
run_bench 100 /tmp/amp_r10_100 320 "$HEAVY8" all

amp 300 /tmp/amp_r12_300
run_bench 300 /tmp/amp_r12_300 960 "$HEAVY8" all

amp 1000 /tmp/amp_r12_1000
run_bench 1000 /tmp/amp_r12_1000 3200 "$N1000Q" no_semdedup

python3 scripts/fit_scaling.py "$OUT" $ARGS
