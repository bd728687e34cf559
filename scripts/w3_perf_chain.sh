#!/bin/bash
# Third-window round-4 perf chain: the container reset between windows
# dropped runs/ (checkpoints + logs), so this window re-lands the two
# cheap VERDICT r3 perf deliverables that need no trained checkpoint:
#   #8 train-step device metrics + chunked-remat ablation
#   #4 input-pipeline table (on-the-fly vs --prerender epoch time)
# It waits for the in-flight bench.py to free the chip, holds the
# runs/.chip_busy lock around each chip step (the wedge-resilient
# bench supervisor waits for it), bounds every step with timeout, and
# clock-guards the tail so the chip is idle well before the driver's
# end-of-round bench.
# Usage: nohup bash scripts/w3_perf_chain.sh > runs/w3_chain.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
unset JAX_PLATFORMS
WINDOW_T0=1787095011   # driver ping at wall_s=729 -> window start ~= T0-729
LOCK=runs/.chip_busy
trap 'rm -f "$LOCK"' EXIT

elapsed () { echo $(( $(date +%s) - WINDOW_T0 + 729 )); }

# 0. wait (up to 18 min) for the running bench.py to finish
for i in $(seq 1 108); do
  grep -q '^rc=' runs/bench_now.log 2>/dev/null && break
  sleep 10
done

# 1. train-step device metrics: TSE (chunked remat), TSE flat-scan
#    ablation, embed — each bounded; rm the lock between steps so a
#    driver bench can interleave
for spec in "tse:" "tse:flat" "embed:"; do
  task=${spec%%:*}; variant=${spec##*:}
  log=runs/tsb_${task}${variant:+_$variant}_w3.log
  touch "$LOCK"
  if [ "$variant" = flat ]; then
    timeout 480 env LOOKONCE_FLAT_SCAN=1 \
      python perf/train_step_bench.py --task "$task" > "$log" 2>&1
  else
    timeout 480 python perf/train_step_bench.py --task "$task" > "$log" 2>&1
  fi
  echo "train_step_bench $spec rc=$? elapsed=$(elapsed)"
  rm -f "$LOCK"
done

# 2. input-pipeline table — only if we still have >=13 min of margin
#    before the ~60 min window mark (timeout 600 + slack)
if [ "$(elapsed)" -lt 2580 ]; then
  touch "$LOCK"
  timeout 600 python perf/epoch_time_bench.py --frac 0.25 \
    > runs/epoch_bench_w3.log 2>&1
  echo "epoch_time_bench rc=$? elapsed=$(elapsed)"
  rm -f "$LOCK"
else
  echo "epoch_time_bench SKIPPED (clock guard, elapsed=$(elapsed))"
fi

echo W3_CHAIN_DONE
