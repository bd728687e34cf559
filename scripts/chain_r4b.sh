#!/bin/bash
# Round-4 SECOND-WINDOW chain: the first-window artifacts (runs/,
# prerender cache, jax cache) were wiped with the host; this re-lands
# the checkpoints + eval tables inside a ~100-minute chip window,
# ordered so the core deliverables land first (VERDICT r3 #2 > #3 >
# #4 > #8). Every step is timeout-bounded and gated on a hard
# deadline so the driver's end-of-round bench.py finds an IDLE chip.
#
# Epoch counts are time-boxed via the new trainer --epochs override
# (r2 evidence: TSE val SI-SNRi plateaus ~epoch 40; embed converges
# ~epoch 25), NOT by editing configs — the configs stay at the
# reference schedule (100 epochs).
#
# Run:  nohup bash scripts/chain_r4b.sh > runs/chain_r4b.log 2>&1 &
set -x
cd /root/repo

PRER=/root/repo/data/prerendered_r4/shared
LOCK=/root/repo/runs/.chip_busy
# free the chip no matter what by this wall-clock time
DEADLINE=${LOOKONCE_CHAIN_DEADLINE:-$(date -d 'today 14:48 UTC' +%s)}
trap 'rm -f "$LOCK"' EXIT

past_deadline () { [ "$(date +%s)" -ge "$DEADLINE" ]; }

locked () {  # run one chip-heavy command while holding the lock
  if past_deadline; then echo "SKIP (deadline): $*"; return 99; fi
  touch "$LOCK"
  "$@"
  local rc=$?
  rm -f "$LOCK"
  return $rc
}

# wait for the CPU prerender warmer (fast: ~3 min for all 640 shards)
for i in $(seq 1 60); do
  grep -q PRERENDER_WARM_DONE runs/prerender_r4.log 2>/dev/null && break
  sleep 10
done

# 1. early bench: validates the chip + warms the fresh .jax_cache so
# the driver's end-of-round run compiles from cache
LOOKONCE_BENCH_BUDGET_S=900 python bench.py | tee runs/bench_r4b_early.json

# 2. TSE retrain (60 epochs x ~30.5 s = ~31 min)
locked timeout 3000 python -m lookoncetohear_tpu.trainer \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --prerender "$PRER" --epochs 60 --resume
echo "TSE done rc=$?"

# 3. embed retrain, exact reference semantics (neg_loss_start_epoch=100
# -> negatives never fire; 35 epochs x ~63 s = ~37 min)
locked timeout 3300 python -m lookoncetohear_tpu.trainer \
  --config configs/embed_synthetic.json --run_dir runs/embed_r4_ref \
  --prerender "$PRER" --epochs 35 --resume
echo "embed (reference recipe) done rc=$?"

# 4. oracle-embedding eval (upper bound), then two-stage with the
# reference-recipe enrollment net; binaural cue columns on
locked timeout 900 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config '' --enroll_run_dir ''
echo "oracle eval rc=$?"

locked timeout 900 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config configs/embed_synthetic.json \
  --enroll_run_dir runs/embed_r4_ref --binaural
echo "two-stage (ref recipe) eval rc=$?"

# 5. serving-precision quality table on the NEW checkpoint (64 scenes
# through the real StreamingEngine) — PERF.md round-4 table
locked timeout 1500 python perf/kv_quality_study.py \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 --n 64 \
  | tee runs/kv_quality_r4.log
echo "quality study rc=$?"

# 6. input-pipeline table: on-the-fly vs prerendered epoch wall time
locked timeout 1200 python perf/epoch_time_bench.py | tee runs/epoch_time_r4.log
echo "epoch-time bench rc=$?"

# 7. train-step device metrics (+ HBM bandwidth / MFU readout)
locked timeout 900 python perf/train_step_bench.py --task tse \
  | tee runs/train_step_r4.log
locked timeout 900 env LOOKONCE_FLAT_SCAN=1 python perf/train_step_bench.py \
  --task tse | tee runs/train_step_flat_r4.log
echo "train-step bench rc=$?"

rm -f "$LOCK"
echo "CHAIN_R4B_DONE"
