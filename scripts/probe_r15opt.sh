#!/bin/bash
# Round-15 OPTIMIZATION probes: solo A/B of every query touched by an
# optimization, before (the HEAD worktree at /root/repo_head) vs after
# (this tree), same box, same invocation (runs=5, warmup=1, local[32],
# sf0.1, noop sink). Usage: scripts/probe_r15opt.sh <tag> <dir> [queries]
set -e -o pipefail
TAG=${1:?tag}
DIR=${2:?repo dir}
TOUCHED=${3:-x_substring_sweep,x_dedup_unified,x_source_overlap,x_unified_survivors,x_tokenizer_compare,x_ivf_probe_sweep,x_rrf_fusion,x_ndcg,x_jl_sweep,x_ivfpq,x_ivfpq_residual,x_curation_funnel,x_bpe_train,x_bpe_tokens,x_bpe_segments,x_bpe_fertility,x_bpe_32,x_bpe_batched,x_bpe_1k,x_unigram_train,x_unigram_tokens,x_unigram_fertility,x_unigram_segments}
RUNS=${SPARK_GRAFT_BENCH_RUNS:-5}
cd "$DIR"
echo "=== probe $TAG in $DIR (runs=$RUNS) ==="; cat /proc/loadavg
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_ONLY="$TOUCHED" \
SPARK_GRAFT_BENCH_RUNS=$RUNS SPARK_GRAFT_BENCH_WARMUP=1 \
SPARK_GRAFT_BENCH_DETAIL="/tmp/probe_r15opt_${TAG}.json" \
scripts/jrun.sh graft.Bench > "/tmp/probe_r15opt_${TAG}.log" 2>&1 || true
grep '"metric":"total"' "/tmp/probe_r15opt_${TAG}.log" | tail -1
grep 'FAILED' "/tmp/probe_r15opt_${TAG}.log" | head -5 || true
