#!/bin/bash
# Round-15 probe — runs AFTER the canonical close (close-first rule).
#
#  A. minhash audit family A/B (verdict item 1): x_minhash_sweep /
#     x_minhash_error / x_dedup_minhash drifted 1.55-1.72x vs r13 with
#     no code change; prime suspect is the new rdd.compress default's
#     CPU on their small sig-table checkpoints (the family was not in
#     the r14 compress A/B set). Solo medians of 5, compress on vs off.
#  B. x_source_overlap solo re-time (verdict item 2): 5.66 -> 7.21 ->
#     7.70 s over two rounds with no flagged code change.
#  C. scale ladders for the r15 additions (x_unigram_train,
#     x_unigram_tokens, x_rrf_fusion) at N=30/100 on the amplified
#     corpora, shuffle sized to the data (the probe_r13 convention).
set -e -o pipefail
cd "$(dirname "$0")/.."
MEM=${SPARK_DRIVER_MEM:-48g}

run_solo() { # queries tag runs extra_conf [sfdir shuffle]
  local q=$1 tag=$2 runs=${3:-5} extra=${4:-} sfdir=${5:-/root/testdata/sf0.1} shuf=${6:-32}
  echo "=== solo $q ($tag, runs=$runs, extra='$extra', sf=$sfdir, shuffle=$shuf) ==="
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_BENCH_RUNS=$runs SPARK_GRAFT_BENCH_WARMUP=1 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf \
    SPARK_GRAFT_BENCH_DETAIL="/tmp/probe_r15_${tag}.json" \
    SPARK_GRAFT_EXTRA_CONF="$extra" \
    SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" \
      > "/tmp/probe_r15_${tag}.log" 2>&1 || true
  grep '"metric":"total"' "/tmp/probe_r15_${tag}.log" | tail -1 || true
  grep 'FAILED' "/tmp/probe_r15_${tag}.log" | head -5 || true
}

MINHASH="x_minhash_sweep,x_minhash_error,x_dedup_minhash"
NEWQ="x_unigram_train,x_unigram_tokens,x_rrf_fusion"

case "${1:-all}" in
  A)  run_solo "$MINHASH" mh_on  5 ""
      run_solo "$MINHASH" mh_off 5 "spark.rdd.compress=false" ;;
  B)  run_solo x_source_overlap srcov 5 "" ;;
  C)  run_solo "$NEWQ" new30  3 "" /tmp/amp_r12_30  96
      run_solo "$NEWQ" new100 3 "" /tmp/amp_r12_100 320 ;;
  all) "$0" A; "$0" B; "$0" C ;;
  *)  echo "usage: $0 [A|B|C|all]" >&2; exit 1 ;;
esac
