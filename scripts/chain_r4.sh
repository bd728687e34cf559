#!/bin/bash
# Round-4 TPU chain (VERDICT r3 #2/#3/#4/#7/#8), ordered so the core
# deliverables land first if the chip (or the round) dies early:
#   1. driver-style bench.py RTF check (wedge-resilient supervisor)
#   2. TSE retrain on the 64-speaker corpus with --prerender
#   3. embed retrain, exact reference recipe (neg_loss_start_epoch=100
#      -> negatives never fire within the 100-epoch schedule,
#      reference configs/embed.json:12-13)
#   4. oracle + two-stage evals (+binaural) on the new checkpoints
#   5. serving-precision quality table (f32/bf16/int8) on the new ckpt
#   6. input-pipeline epoch-time table + train-step device metrics
#   7. engine device benchmark at 64 streams
#   8. second embed retrain (improved negatives-from-epoch-20 recipe)
#      + its two-stage eval — the comparison row, last because it is
#      the nice-to-have
# Run on an idle chip:  nohup bash scripts/chain_r4.sh > runs/chain_r4.log 2>&1 &
set -x
cd /root/repo

PRER=/root/repo/data/prerendered_r4   # gitignored (data/prerendered*/)

# Chip-ownership lock: while present (and fresh), bench.py's
# supervisor waits instead of measuring a contended chip. Held around
# every chip-heavy step below; removed around our own bench calls and
# on any exit.
LOCK=/root/repo/runs/.chip_busy
trap 'rm -f "$LOCK"' EXIT

locked () {  # run one chip-heavy command while holding the lock
  touch "$LOCK"
  "$@"
  local rc=$?
  rm -f "$LOCK"
  return $rc
}

retry_train () {  # config run_dir prerender_subdir timeout_s
  # NOTE the wedge trade-off: `timeout` SIGTERMs a live TPU client
  # (which itself wedges the proxied chip), so per-run timeouts are
  # sized ~2x the expected wall time as a last resort only, and the
  # retry idle is 30 min — the chip needs ~45-60 min of ZERO traffic
  # to self-recover, and orbax resumes from the last epoch anyway.
  for i in 1 2 3; do
    touch "$LOCK"
    timeout "${4:-10800}" python -m lookoncetohear_tpu.trainer \
      --config "$1" --run_dir "$2" --prerender "$PRER/$3" --resume \
      && { rm -f "$LOCK"; return 0; }
    rm -f "$LOCK"
    echo "train $2 attempt $i failed rc=$?; idling 1800s for chip recovery"
    sleep 1800
  done
  return 1
}

python bench.py | tee runs/bench_r4_early.json

# all three trainings consume the IDENTICAL SyntheticTSEDataset args
# (512/64/64 scenes, 64 speakers, 5 s, 256-d embeddings), so they
# share ONE prerender cache — later runs skip straight past rendering
# (render_split is resumable/idempotent per shard)
retry_train configs/tsh_synthetic.json runs/tsh_r4 shared 9000
echo "TSE done rc=$?"

retry_train configs/embed_synthetic.json runs/embed_r4_ref shared 14400
echo "embed (reference recipe) done rc=$?"

# oracle-embedding eval (upper bound), then two-stage with the
# reference-recipe enrollment net; binaural cue columns on
locked timeout 3600 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config '' --enroll_run_dir ''
echo "oracle eval rc=$?"   # CSV name: results_test_clean.csv

locked timeout 3600 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config configs/embed_synthetic.json \
  --enroll_run_dir runs/embed_r4_ref --binaural
echo "two-stage (ref recipe) eval rc=$?"

# serving-precision quality table on the NEW checkpoint (>=64 scenes
# through the real StreamingEngine) — refreshes PERF.md round-4 table
locked timeout 3600 python perf/kv_quality_study.py \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 --n 64 \
  | tee runs/kv_quality_r4.log
echo "quality study rc=$?"

# input-pipeline table: on-the-fly vs prerendered epoch wall time
locked timeout 3600 python perf/epoch_time_bench.py | tee runs/epoch_time_r4.log
echo "epoch-time bench rc=$?"

# train-step device metrics (+ remat ablation via LOOKONCE_FLAT_SCAN)
locked timeout 1800 python perf/train_step_bench.py --task tse \
  | tee runs/train_step_r4.log
locked timeout 1800 env LOOKONCE_FLAT_SCAN=1 python perf/train_step_bench.py \
  --task tse | tee runs/train_step_flat_r4.log
locked timeout 1800 python perf/train_step_bench.py --task embed \
  | tee runs/train_step_embed_r4.log
echo "train-step bench rc=$?"

# engine device benchmark at the serving shape
locked timeout 1800 python perf/engine_bench.py | tee runs/engine_r4.log
echo "engine bench rc=$?"

python bench.py | tee runs/bench_r4_mid.json

# nice-to-have last: the improved negatives-from-epoch-20 recipe and
# its comparison eval row. Skipped when the round clock is short —
# the driver's own bench.py fires at round end (~11:22 UTC) and must
# find an IDLE chip, and this retrain holds it ~2.5 h.
DEADLINE_EPOCH=${LOOKONCE_TAIL_DEADLINE:-$(date -d '2026-08-18 08:30 UTC' +%s)}
if [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
  echo "past tail deadline; skipping neg20 retrain + eval"
  python bench.py | tee runs/bench_r4_final.json
  echo "CHAIN DONE (no tail)"
  exit 0
fi
retry_train configs/embed_synthetic_neg20.json runs/embed_r4_neg20 shared 14400
echo "embed (neg20 recipe) done rc=$?"

locked timeout 3600 python -m lookoncetohear_tpu.ts_hear_test \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
  --enroll_config configs/embed_synthetic_neg20.json \
  --enroll_run_dir runs/embed_r4_neg20 --binaural
echo "two-stage (neg20 recipe) eval rc=$?"

python bench.py | tee runs/bench_r4_final.json
echo "CHAIN DONE"
