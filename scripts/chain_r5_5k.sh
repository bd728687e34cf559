#!/bin/bash
# Round-5 phase C: the corpus-scale milestone (VERDICT r4 #3) — train
# TSE + embed on the prerendered 5,120-scene / 128-speaker corpus
# (10x round 4's) and land oracle + two-stage evals on its 256-scene
# test split. Epochs use --frac 0.2: the loader reshuffles per epoch
# and takes the first 20% of batches, so every ~61 s epoch sweeps a
# fresh ~1,024-scene draw of the corpus — full-corpus diversity at a
# budgetable epoch time (val monitoring also sees a 20% draw; the
# final tables below evaluate the FULL test split via ts_hear_test).
# Usage: nohup bash scripts/chain_r5_5k.sh > runs/chain_r5_5k.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS

PRER=/root/repo/data/prerendered_5k/shared
LOCK=/root/repo/runs/.chip_busy
DEADLINE=${LOOKONCE_CHAIN_DEADLINE:-$(( $(date +%s) + 21600 ))}
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

# 0. wait for phase B
for i in $(seq 1 960); do
  grep -q POST_CHAIN_R5_DONE runs/post_chain_r5.log 2>/dev/null && break
  sleep 15
done
grep -q POST_CHAIN_R5_DONE runs/post_chain_r5.log || { echo "phase B never finished"; exit 1; }

# 1. TSE separator on the 5k corpus (50 x ~61 s epochs)
locked timeout 5400 python -m lookoncetohear_tpu.trainer \
  --config configs/tsh_synthetic_5k.json --run_dir runs/tsh_r5_5k \
  --prerender "$PRER" --frac 0.2 --epochs 50 --resume
echo "TSE 5k train rc=$?"
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/tsh_r5_5k --out checkpoints/tsh_r5_5k_best.npz
cp runs/tsh_r5_5k/metrics.jsonl checkpoints/tsh_r5_5k_metrics.jsonl 2>/dev/null
commit_now "checkpoints: tsh_r5_5k separator (5k-scene 128-speaker corpus)" \
  checkpoints/tsh_r5_5k_best.npz checkpoints/tsh_r5_5k_metrics.jsonl

# 2. enrollment net on the 5k corpus (reference recipe, 25 x ~126 s)
locked timeout 5400 python -m lookoncetohear_tpu.trainer \
  --config configs/embed_synthetic_5k.json --run_dir runs/embed_r5_5k \
  --prerender "$PRER" --frac 0.2 --epochs 25 --resume
echo "embed 5k train rc=$?"
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/embed_r5_5k --out checkpoints/embed_r5_5k_best.npz
cp runs/embed_r5_5k/metrics.jsonl checkpoints/embed_r5_5k_metrics.jsonl 2>/dev/null
commit_now "checkpoints: embed_r5_5k enrollment net (5k corpus)" \
  checkpoints/embed_r5_5k_best.npz checkpoints/embed_r5_5k_metrics.jsonl

# 3. oracle + two-stage evals, FULL 256-scene test split
locked timeout 3600 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic_5k.json --run_dir runs/tsh_r5_5k \
  --enroll_config '' --enroll_run_dir '' \
  2>&1 | tee runs/eval_oracle_r5_5k.log
echo "5k oracle eval rc=$?"
locked timeout 3600 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic_5k.json --run_dir runs/tsh_r5_5k \
  --enroll_config configs/embed_synthetic_5k.json \
  --enroll_run_dir runs/embed_r5_5k \
  2>&1 | tee runs/eval_twostage_r5_5k.log
echo "5k two-stage eval rc=$?"

mkdir -p docs/results_r5
for f in runs/tsh_r5_5k/results_*.csv; do
  [ -e "$f" ] && cp "$f" "docs/results_r5/5k_$(basename "$f")"
done
cp runs/eval_oracle_r5_5k.log runs/eval_twostage_r5_5k.log \
  docs/results_r5/ 2>/dev/null
commit_now "results: 5k-corpus oracle + two-stage eval logs/CSVs" docs/results_r5

rm -f "$LOCK"
echo "CHAIN_R5_5K_DONE"
