#!/bin/bash
# Round-12 probe, stage 4 — the combined quiet-box run after the
# packed micro-unit distance kernel landed. Produces SCALING_r12b.json.
#
#  A. FRESH same-code ladders for the kernel-touched family
#     (x_semantic_dedup, x_ivfpq, x_ndcg): their old N=100/300 points
#     measured the exploded kernel, so every fitted point re-runs on
#     this code — no mixed-code ladders. x_semantic_dedup's N=300
#     point is newly affordable (the exploded kernel projected
#     ~80 min/run; packed measured 2.7x faster at sf0.1 with the
#     dominant n*d*k hash-aggregate term removed entirely).
#  B. A fresh N=300 s960 drift-check point for group A
#     (x_dedup_unified, x_unified_survivors, x_substring_sweep,
#     x_bpe_train) — these queries are UNCHANGED code, so their
#     recorded SCALING_r12 envelope points remain valid and are
#     synthesized into the fit; the fresh point both checks
#     cross-session host drift and joins the envelope.
#  C. The N=1000 decade (~16 GB) for group A + x_ivfpq/x_ndcg — the
#     evidence-ceiling raise the r11 verdict asked for.
#     x_semantic_dedup stays excluded at N=1000 BY ITS DOCUMENTED
#     Theta(n^1.5) BOUND (projects >1 h/run even packed); x_hits
#     stays excluded as in r12b (~linear, projects ~50 min/run).
set -e -o pipefail
cd "$(dirname "$0")/.."
MEM=${PROBE_MEM:-48g}
ARGS=""

run_bench() { # N dir shuffle queries tag
  local n=$1 dir=$2 shuf=$3 queries=$4 tag=$5
  local detail="/tmp/probe_r12d_n${n}_s${shuf}_${tag}.json"
  echo "=== N=$n shuffle=$shuf $tag ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$queries" \
    SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_WARMUP=0 \
    SPARK_GRAFT_BENCH_SHUFFLE=$shuf SPARK_GRAFT_BENCH_DETAIL="$detail" \
    SPARK_DRIVER_MEM=$MEM \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" \
      > "/tmp/probe_r12d_n${n}_${tag}.log" 2>&1 || true
  grep '"metric":"total"' "/tmp/probe_r12d_n${n}_${tag}.log" | tail -1
  grep 'FAILED' "/tmp/probe_r12d_n${n}_${tag}.log" | head -5 || true
  ARGS="$ARGS $n:$detail"
}

amp() { # N dir
  local n=$1 dir=$2
  if [ ! -d "$dir" ]; then
    SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Amplify /root/testdata/sf0.1 $dir $n" 2>&1 | tail -1
  fi
}

amp 100  /tmp/amp_r12_100
amp 300  /tmp/amp_r12_300
amp 1000 /tmp/amp_r12_1000

# Recorded SCALING_r12 envelope points for the UNCHANGED queries
# (kernel-family points are code-stale and excluded — their ladders
# re-measure fresh below).
# fresh recorded-point set: leftovers from an earlier probe session
# (possibly fit against a different SCALING artifact) must not join
rm -f /tmp/probe_r12_recorded_n*.json
python3 - <<'EOF'
import json
src = json.load(open("SCALING_r12.json"))
stale = {"x_semantic_dedup", "x_ivfpq", "x_ndcg"}
byn = {}
for q, r in src["queries"].items():
    if q in stale: continue
    for n, t in r["seconds"].items():
        byn.setdefault(n, {})[q] = {"median": t}
for n, qs in byn.items():
    with open(f"/tmp/probe_r12_recorded_n{n}.json", "w") as f:
        json.dump({"queries": qs}, f)
    print(f"recorded n={n}: {sorted(qs)}")
EOF
for f in /tmp/probe_r12_recorded_n*.json; do
  # unmatched glob passes the literal pattern through (nullglob is
  # off) — skip it instead of handing the fit a bogus "n*:file" arg
  [ -e "$f" ] || continue
  # strip the full prefix, not just non-digits — the filename contains
  # "r12" and a global digit-squash would read n100 as 12100
  n=$(basename "$f" .json | sed 's/^probe_r12_recorded_n//')
  ARGS="$ARGS $n:$f"
done

# A: kernel-family fresh ladder (cheap — first, for early signal)
run_bench 100  /tmp/amp_r12_100  320 "x_semantic_dedup,x_ivfpq,x_ndcg" kern
run_bench 300  /tmp/amp_r12_300  960 "x_semantic_dedup,x_ivfpq,x_ndcg" kern
run_bench 300  /tmp/amp_r12_300  320 "x_ivfpq,x_ndcg" kern320

# B: group-A same-session drift-check / envelope point
run_bench 300  /tmp/amp_r12_300  960 "x_dedup_unified,x_unified_survivors,x_substring_sweep,x_bpe_train" ga

# C: the N=1000 decade
run_bench 1000 /tmp/amp_r12_1000 960 "x_ivfpq,x_ndcg" kern
run_bench 1000 /tmp/amp_r12_1000 960 "x_dedup_unified,x_unified_survivors,x_substring_sweep,x_bpe_train" ga

python3 scripts/fit_scaling.py SCALING_r12b.json $ARGS
echo "probe_r12d done"
