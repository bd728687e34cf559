#!/bin/bash
# Round-5 phase B, run after chain_r5.sh: (1) bench.py on the new
# MXU-norms serving graph — measures the round's RTF work AND warms
# the fresh serving-scan compile cache for the driver's end-of-round
# bench; (2) the embedding-direction-augmentation A/B (VERDICT r4 #2):
# train the SAME separator recipe with embed_aug_std=0.33 (the only
# config difference vs tsh_r5, same seed), then oracle + two-stage
# evals so the mismatch-robustness effect separates from raw separator
# quality. Exports + commits land immediately after each step.
# Usage: nohup bash scripts/post_chain_r5.sh > runs/post_chain_r5.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS

PRER=/root/repo/data/prerendered_r4/shared
LOCK=/root/repo/runs/.chip_busy
DEADLINE=${LOOKONCE_CHAIN_DEADLINE:-$(( $(date +%s) + 14400 ))}
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

# 0. wait for phase A (artifact-gated; bail out if it never lands)
for i in $(seq 1 720); do
  grep -q CHAIN_R5_DONE runs/chain_r5.log 2>/dev/null && break
  sleep 15
done
grep -q CHAIN_R5_DONE runs/chain_r5.log || { echo "chain_r5 never finished"; exit 1; }

# 1. bench on the new serving graph (cold compile ~13 min through the
# proxied transport; budget covers it)
LOOKONCE_BENCH_BUDGET_S=2400 python bench.py > runs/bench_r5_mxu.json \
  2> runs/bench_r5_mxu.log
echo "bench rc=$?"
cat runs/bench_r5_mxu.json

# 2. embaug arm of the A/B (identical recipe/seed, embed_aug_std=0.33)
locked timeout 3600 python -m lookoncetohear_tpu.trainer \
  --config configs/tsh_synthetic_embaug.json --run_dir runs/tsh_r5_embaug \
  --prerender "$PRER" --epochs 60 --resume
echo "embaug train rc=$?"
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/tsh_r5_embaug --out checkpoints/tsh_r5_embaug_best.npz
cp runs/tsh_r5_embaug/metrics.jsonl checkpoints/tsh_r5_embaug_metrics.jsonl 2>/dev/null
commit_now "checkpoints: tsh_r5_embaug separator (embed_aug_std=0.33 A/B arm)" \
  checkpoints/tsh_r5_embaug_best.npz checkpoints/tsh_r5_embaug_metrics.jsonl

# 3. oracle + two-stage evals of the embaug separator
locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic_embaug.json --run_dir runs/tsh_r5_embaug \
  --enroll_config '' --enroll_run_dir '' \
  2>&1 | tee runs/eval_oracle_r5_embaug.log
echo "embaug oracle eval rc=$?"
locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic_embaug.json --run_dir runs/tsh_r5_embaug \
  --enroll_config configs/embed_synthetic.json \
  --enroll_run_dir runs/embed_r5_ref \
  2>&1 | tee runs/eval_twostage_r5_embaug.log
echo "embaug two-stage eval rc=$?"

mkdir -p docs/results_r5
cp runs/tsh_r5_embaug/results_*.csv docs/results_r5/ 2>/dev/null
for f in runs/tsh_r5_embaug/results_*.csv; do
  [ -e "$f" ] && cp "$f" "docs/results_r5/embaug_$(basename "$f")"
done
cp runs/eval_oracle_r5_embaug.log runs/eval_twostage_r5_embaug.log \
  docs/results_r5/ 2>/dev/null
commit_now "results: embaug A/B oracle + two-stage eval logs/CSVs" docs/results_r5

rm -f "$LOCK"
echo "POST_CHAIN_R5_DONE"
