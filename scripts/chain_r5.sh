#!/bin/bash
# Round-5 chain, phase A: re-land the VERDICT r4 #1 deliverable — the
# two-stage vs oracle quality table on CURRENT checkpoints — and make
# it reset-proof: every training step is followed IMMEDIATELY by an
# .npz export to committed checkpoints/ plus a git commit, so a window
# reset can no longer erase the round's results (round 4 lost both
# checkpoints that way).
#
# ADVICE r4 fixes vs older chains: every timeout is >= the ~780 s
# cold-compile floor plus 2x the expected runtime; the deadline comes
# from env (LOOKONCE_CHAIN_DEADLINE, default now+4h) instead of a
# hardcoded window epoch; waits poll for the concrete artifact rather
# than falling through open.
#
# Run:  nohup bash scripts/chain_r5.sh > runs/chain_r5.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS

PRER=/root/repo/data/prerendered_r4/shared
LOCK=/root/repo/runs/.chip_busy
DEADLINE=${LOOKONCE_CHAIN_DEADLINE:-$(( $(date +%s) + 14400 ))}
trap 'rm -f "$LOCK"' EXIT

past_deadline () { [ "$(date +%s)" -ge "$DEADLINE" ]; }

locked () {  # one chip-heavy command while holding the lock
  if past_deadline; then echo "SKIP (deadline): $*"; return 99; fi
  touch "$LOCK"
  "$@"
  local rc=$?
  rm -f "$LOCK"
  return $rc
}

commit_now () {  # commit specific files right away (reset-proofing);
  # retried in case an interactive commit holds the index lock
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    git add "$@" && git commit -m "$msg" && return 0
    sleep 7
  done
  echo "COMMIT FAILED: $msg"
  return 1
}

# 0. wait for the early bench warm to finish (artifact: rc= line in
# its log) — abort rather than run concurrently with it
for i in $(seq 1 240); do
  [ -s runs/bench_r5_early.json ] && break
  sleep 10
done
[ -s runs/bench_r5_early.json ] || { echo "bench warm never finished"; exit 1; }

# 1. TSE separator retrain on the 64-speaker corpus (60 epochs x
# ~30.7 s + cold compile)
locked timeout 3600 python -m lookoncetohear_tpu.trainer \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r5 \
  --prerender "$PRER" --epochs 60 --resume
echo "TSE train rc=$?"
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/tsh_r5 --out checkpoints/tsh_r5_best.npz
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/tsh_r5 --out checkpoints/tsh_r5_last_full.npz \
  --which last --full
cp runs/tsh_r5/metrics.jsonl checkpoints/tsh_r5_metrics.jsonl 2>/dev/null
commit_now "checkpoints: tsh_r5 separator (64-spk corpus, 60 epochs) npz export" \
  checkpoints/tsh_r5_best.npz checkpoints/tsh_r5_last_full.npz \
  checkpoints/tsh_r5_metrics.jsonl

# 2. enrollment net, exact reference recipe (neg_loss_start_epoch=100)
locked timeout 3900 python -m lookoncetohear_tpu.trainer \
  --config configs/embed_synthetic.json --run_dir runs/embed_r5_ref \
  --prerender "$PRER" --epochs 35 --resume
echo "embed train rc=$?"
JAX_PLATFORMS=cpu timeout 600 python scripts/export_ckpt.py \
  --run_dir runs/embed_r5_ref --out checkpoints/embed_r5_ref_best.npz
cp runs/embed_r5_ref/metrics.jsonl checkpoints/embed_r5_ref_metrics.jsonl 2>/dev/null
commit_now "checkpoints: embed_r5_ref enrollment net (reference recipe) npz export" \
  checkpoints/embed_r5_ref_best.npz checkpoints/embed_r5_ref_metrics.jsonl

# 3. oracle (gt-embedding) eval — the upper bound
locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r5 \
  --enroll_config '' --enroll_run_dir '' --binaural \
  2>&1 | tee runs/eval_oracle_r5.log
echo "oracle eval rc=$?"

# 4. two-stage eval (enrollment net -> separator), the headline
locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r5 \
  --enroll_config configs/embed_synthetic.json \
  --enroll_run_dir runs/embed_r5_ref --binaural \
  2>&1 | tee runs/eval_twostage_r5.log
echo "two-stage eval rc=$?"

mkdir -p docs/results_r5
cp runs/tsh_r5/results_*.csv docs/results_r5/ 2>/dev/null
cp runs/eval_oracle_r5.log runs/eval_twostage_r5.log docs/results_r5/ 2>/dev/null
commit_now "results: round-5 oracle + two-stage eval CSVs/logs (64-spk corpus)" \
  docs/results_r5

rm -f "$LOCK"
echo "CHAIN_R5_DONE"
