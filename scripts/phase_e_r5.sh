#!/bin/bash
# Round-5 phase E (stretch): (1) the v2 ring step-kernel variant
# micro-bench (elementwise vs batched-MXU-dot, across block_rows) —
# the data that decides whether LOOKONCE_ATTN_MXU_DOT becomes the
# default; (2) the IMPROVED enrollment recipe (negatives firing from
# epoch 20, configs/embed_synthetic_neg20.json) next to phase A's
# exact-reference recipe, plus its two-stage eval row.
# Usage: nohup bash scripts/phase_e_r5.sh > runs/phase_e_r5.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS

PRER=/root/repo/data/prerendered_r4/shared
LOCK=/root/repo/runs/.chip_busy
DEADLINE=${LOOKONCE_CHAIN_DEADLINE:-$(( $(date +%s) + 28800 ))}
trap 'rm -f "$LOCK"' EXIT
past_deadline () { [ "$(date +%s)" -ge "$DEADLINE" ]; }
locked () {
  if past_deadline; then echo "SKIP (deadline): $*"; return 99; fi
  touch "$LOCK"; "$@"; local rc=$?; rm -f "$LOCK"; return $rc
}
commit_now () {
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@" && git commit -m "$msg" && return 0
    sleep 7
  done
  echo "COMMIT FAILED: $msg"; return 1
}

# 0. wait for phase D
for i in $(seq 1 1680); do
  grep -q PERF_R5_DONE runs/perf_r5.log 2>/dev/null && break
  sleep 15
done
grep -q PERF_R5_DONE runs/perf_r5.log || { echo "phase D never finished"; exit 1; }

mkdir -p docs/perf_r5

# 1. ring step-kernel variant micro-bench
locked timeout 2400 python perf/ring_step_kernel_bench.py \
  2>&1 | tee runs/ring_kernel_bench_r5.log
cp runs/ring_kernel_bench_r5.log docs/perf_r5/ 2>/dev/null
commit_now "perf: ring step-kernel variant micro-bench (mxu_dot A/B)" \
  docs/perf_r5

# 2. improved-recipe enrollment net (negatives from epoch 20)
locked timeout 3900 python -m lookoncetohear_tpu.trainer \
  --config configs/embed_synthetic_neg20.json --run_dir runs/embed_r5_neg20 \
  --prerender "$PRER" --epochs 35 --resume
echo "embed neg20 train rc=$?"
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/embed_r5_neg20 --out checkpoints/embed_r5_neg20_best.npz
cp runs/embed_r5_neg20/metrics.jsonl checkpoints/embed_r5_neg20_metrics.jsonl 2>/dev/null
commit_now "checkpoints: embed_r5_neg20 enrollment net (improved recipe)" \
  checkpoints/embed_r5_neg20_best.npz checkpoints/embed_r5_neg20_metrics.jsonl

# 3. two-stage eval with the improved enrollment net
locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r5 \
  --enroll_config configs/embed_synthetic_neg20.json \
  --enroll_run_dir runs/embed_r5_neg20 \
  2>&1 | tee runs/eval_twostage_r5_neg20.log
echo "neg20 two-stage eval rc=$?"
mkdir -p docs/results_r5
for f in runs/tsh_r5/results_*.csv; do
  [ -e "$f" ] && cp "$f" docs/results_r5/ 2>/dev/null
done
cp runs/eval_twostage_r5_neg20.log docs/results_r5/ 2>/dev/null
commit_now "results: improved-recipe (neg20) two-stage eval" docs/results_r5

rm -f "$LOCK"
echo "PHASE_E_R5_DONE"
