#!/bin/bash
# Round-14 probe — SOLO steady-state re-times for the two r13 "no code
# change" regressions (verdict items 4 and 6). Runs AFTER the canonical
# close (the r13 process lesson: close first, probe after — the
# canonical map must never be taken on a post-churn envelope).
#
#  A. x_ivf_probe_sweep: driver 8.16 s vs r12 3.65 (2.23x), local 4.64
#     vs 2.38 (1.95x), runs monotonically rising, code untouched.
#     Solo medians of 5 on a quiet box adjudicate envelope vs real.
#  B. x_dup_components: local 8.79 s vs r12 2.22 (3.96x — beyond even
#     the 1.32x envelope p99) while the driver shows only 1.53x.
set -e -o pipefail
cd "$(dirname "$0")/.."   # sbt must run at the repo root, wherever invoked from
MEM=${SPARK_DRIVER_MEM:-48g}

run_solo() { # query tag runs
  local q=$1 tag=$2 runs=${3:-5}
  echo "=== solo $q ($tag, runs=$runs) ==="
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_BENCH_RUNS=$runs SPARK_GRAFT_BENCH_WARMUP=1 \
    SPARK_GRAFT_BENCH_DETAIL="/tmp/probe_r14_${tag}.json" \
    SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" \
      > "/tmp/probe_r14_${tag}.log" 2>&1 || true
  # || true: a dead bench leaves no total line; keep the diagnostics
  grep '"metric":"total"' "/tmp/probe_r14_${tag}.log" | tail -1 || true
  grep 'FAILED' "/tmp/probe_r14_${tag}.log" | head -5 || true
}

case "${1:-all}" in
  A)   run_solo x_ivf_probe_sweep ivfsweep ;;
  B)   run_solo x_dup_components dupcomp ;;
  all) run_solo x_ivf_probe_sweep ivfsweep
       run_solo x_dup_components dupcomp ;;
  *)   echo "usage: $0 [A|B|all]" >&2; exit 1 ;;
esac
