#!/bin/bash
# Round-5 phase D: the on-record perf tables (VERDICT r4 #4/#5/#8).
#   1. train-step device metrics + HBM bandwidth + MFU, TSE chunked
#      remat vs flat-scan ablation, and embed — never completed on
#      chip before.
#   2. input-pipeline epoch-time table (on-the-fly vs prerendered).
#   3. serving-precision quality (f32 / bf16 / bf16+int8-v2) on the
#      ROUND-5 checkpoint through the real StreamingEngine, 64 scenes.
#   4. serving-step decomposition after the MXU-norms change
#      (model_step_ablation rows: full / noattn).
# All timeouts sit above the ~780 s cold-compile floor. Logs are
# copied into docs/perf_r5/ and committed as soon as each step ends.
# Usage: nohup bash scripts/perf_r5.sh > runs/perf_r5.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS

LOCK=/root/repo/runs/.chip_busy
DEADLINE=${LOOKONCE_CHAIN_DEADLINE:-$(( $(date +%s) + 25200 ))}
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

# 0. wait for phase C
for i in $(seq 1 1440); do
  grep -q CHAIN_R5_5K_DONE runs/chain_r5_5k.log 2>/dev/null && break
  sleep 15
done
grep -q CHAIN_R5_5K_DONE runs/chain_r5_5k.log || { echo "phase C never finished"; exit 1; }

mkdir -p docs/perf_r5

# 1. train-step device metrics (MFU/HBM), remat ablation, embed
locked timeout 1800 python perf/train_step_bench.py --task tse \
  2>&1 | tee runs/tsb_tse_r5.log
locked timeout 1800 env LOOKONCE_FLAT_SCAN=1 \
  python perf/train_step_bench.py --task tse \
  2>&1 | tee runs/tsb_tse_flat_r5.log
locked timeout 1800 python perf/train_step_bench.py --task embed \
  2>&1 | tee runs/tsb_embed_r5.log
cp runs/tsb_*_r5.log docs/perf_r5/ 2>/dev/null
commit_now "perf: round-5 train-step device metrics (MFU/HBM, remat ablation)" \
  docs/perf_r5

# 2. input-pipeline epoch-time table
locked timeout 2400 python perf/epoch_time_bench.py --frac 0.25 \
  2>&1 | tee runs/epoch_bench_r5.log
cp runs/epoch_bench_r5.log docs/perf_r5/ 2>/dev/null
commit_now "perf: round-5 input-pipeline epoch-time table" docs/perf_r5

# 3. serving-precision quality on the round-5 checkpoint (64 scenes)
locked timeout 3000 python perf/kv_quality_study.py \
  --config configs/tsh_synthetic.json --run_dir runs/tsh_r5 --n 64 \
  2>&1 | tee runs/kv_quality_r5.log
cp runs/kv_quality_r5.log docs/perf_r5/ 2>/dev/null
commit_now "perf: round-5 serving-precision quality study (f32/bf16/int8)" \
  docs/perf_r5

# 4. serving-step decomposition after the MXU-norms change
locked timeout 1800 python perf/model_step_ablation.py full noattn \
  2>&1 | tee runs/ablation_r5.log
cp runs/ablation_r5.log docs/perf_r5/ 2>/dev/null
commit_now "perf: round-5 serving-step ablation (post MXU-norms)" docs/perf_r5

rm -f "$LOCK"
echo "PERF_R5_DONE"
