#!/bin/bash
# Round-13 probe (quiet box — nothing else running):
#  stage A: x_dedup_unified at N=1000 under ZSTD shuffle/spill
#    compression (the r12 disk ceiling was the box's ~60 GB free
#    /tmp, not the engine — zstd's ~2x ratio over lz4 on gram/text
#    blocks is the judge-suggested lever). Event log enabled for
#    per-stage spill attribution if it still dies.
#  stage B: x_hits at N=1000 (same config; 884.6 s at N=300, tail
#    1.049 — projected ~50 min).
#  stage C: N=30/100 ladder for the round's new oracle query
#    (x_bpe_32) — every new family gets measured scale evidence.
set -e -o pipefail
cd "$(dirname "$0")/.."
MEM=${PROBE_MEM:-48g}
mkdir -p /tmp/probe_r13_eventlog

run_bench() { # N dir shuffle queries tag extra_env...
  local n=$1 dir=$2 shuf=$3 queries=$4 tag=$5
  local detail="/tmp/probe_r13_n${n}_s${shuf}_${tag}.json"
  echo "=== N=$n shuffle=$shuf $tag ==="
  df -h / | tail -1
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$queries" \
    SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf SPARK_GRAFT_BENCH_DETAIL="$detail" \
    SPARK_GRAFT_IO_CODEC=zstd \
    SPARK_GRAFT_EXTRA_CONF="spark.eventLog.enabled=true;spark.eventLog.dir=/tmp/probe_r13_eventlog;spark.eventLog.compress=true;spark.rdd.compress=true;spark.cleaner.periodicGC.interval=60s${PROBE_CONF:+;$PROBE_CONF}" \
    SPARK_DRIVER_MEM=$MEM \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" \
      > "/tmp/probe_r13_n${n}_${tag}.log" 2>&1 || true
  # || true: under pipefail a missing total line (bench died — the
  # case the sbt || true anticipates) would abort the probe before the
  # FAILED lines and closing df it exists to capture (ADVICE r13)
  grep '"metric":"total"' "/tmp/probe_r13_n${n}_${tag}.log" | tail -1 || true
  grep 'FAILED' "/tmp/probe_r13_n${n}_${tag}.log" | head -5 || true
  df -h / | tail -1
}

case "${1:-A}" in
  A) run_bench 1000 /tmp/amp_r12_1000 3200 "x_dedup_unified" uni ;;
  B) run_bench 1000 /tmp/amp_r12_1000 3200 "x_hits" hits ;;
  C) for n in 30 100; do
       if [ ! -d /tmp/amp_r12_$n ]; then
         SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
           sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 /tmp/amp_r12_$n $n" 2>&1 | tail -1
       fi
     done
     run_bench 30  /tmp/amp_r12_30  96  "x_bpe_32" bpe32
     run_bench 100 /tmp/amp_r12_100 320 "x_bpe_32" bpe32 ;;
esac
echo "probe_r13 stage ${1:-A} done"
