#!/bin/bash
# Post-chain round-4 runner: the second-window chain (chain_r4b.sh)
# deadline-skips its eval/bench tail to keep the chip free around the
# driver's end-of-round bench. This script re-lands those steps AFTER
# the chain exits, ordered by VERDICT r3 priority (#2 evals > #3
# quality > #4 input pipeline > #8 train-step metrics), holding
# runs/.chip_busy around each chip step and RELEASING it in between —
# the wedge-resilient bench supervisor waits for the lock (up to
# 40 min), so the driver bench interleaves safely whenever it fires.
# Every step is timeout-bounded at ~2x its expected runtime so a hang
# can't pin the chip, but generously enough that SIGTERM-mid-step
# (which wedges the proxied device) stays unlikely.
# Usage: nohup bash scripts/post_chain_r4.sh > runs/post_chain_r4.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS   # real chip

LOCK=/root/repo/runs/.chip_busy
trap 'rm -f "$LOCK"' EXIT

# 0. wait for the chain to exit (frees the chip + the single host core)
for i in $(seq 1 240); do
  grep -q CHAIN_R4B_DONE runs/chain_r4b.log 2>/dev/null && break
  sleep 15
done
grep -q CHAIN_R4B_DONE runs/chain_r4b.log || { echo "chain never finished"; exit 1; }

# free the lone host core: the CPU quality study is superseded by the
# on-chip run below (CPU-only process — safe to kill)
[ -f /tmp/kvq.pid ] && kill "$(cat /tmp/kvq.pid)" 2>/dev/null

locked () {
  touch "$LOCK"
  "$@"
  local rc=$?
  rm -f "$LOCK"
  return $rc
}

# 1. oracle (gt-embedding) eval on the retrained separator
locked timeout 1200 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config '' --enroll_run_dir '' --binaural \
  | tee runs/eval_oracle_r4.log
echo "oracle eval rc=$?"

# 2. two-stage eval with the reference-recipe enrollment net
locked timeout 1200 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config configs/embed_synthetic.json \
  --enroll_run_dir runs/embed_r4_ref --binaural \
  | tee runs/eval_twostage_r4.log
echo "two-stage eval rc=$?"

# 3. serving-precision quality on the new ckpt (real StreamingEngine)
locked timeout 2400 python perf/kv_quality_study.py \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 --n 64 \
  | tee runs/kv_quality_r4.log
echo "quality study rc=$?"

# 4. input-pipeline table: on-the-fly vs prerendered epoch wall time
locked timeout 2400 python perf/epoch_time_bench.py --frac 0.5 \
  | tee runs/epoch_time_r4.log
echo "epoch-time bench rc=$?"

# 5. train-step device metrics (+ HBM bandwidth / MFU), remat ablation
locked timeout 1200 python perf/train_step_bench.py --task tse \
  | tee runs/train_step_r4.log
echo "train-step bench rc=$?"
locked timeout 1200 env LOOKONCE_FLAT_SCAN=1 python perf/train_step_bench.py \
  --task tse | tee runs/train_step_flat_r4.log
echo "train-step (flat scan, remat ablation) bench rc=$?"

rm -f "$LOCK"
echo "POST_CHAIN_R4_DONE"
