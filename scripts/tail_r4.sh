#!/bin/bash
# Round-4 tail: spend the post-chain chip window (chain exit -> driver
# bench ~11:22 UTC) on whichever lever the chain's two-stage eval says
# is binding:
#   embaug      — fine-tune the separator with conditioning-embedding
#                 augmentation (configs/tsh_synthetic_embaug.json,
#                 40 epochs warm-started from runs/tsh_r4/best.ckpt),
#                 then oracle + two-stage evals on the fine-tuned ckpt.
#                 Pick when the enroll embeddings are decent (cosine
#                 high) but the separator is brittle to their noise.
#   neg20 [N]   — retrain the enrollment net with negatives from
#                 epoch 20 (VERDICT r3 #7 comparison row), N epochs
#                 (default 60, ~63 s each), then two-stage eval with
#                 the tsh_r4 separator. Pick when embedding quality is
#                 the binding constraint (low cosine similarity).
# Usage: nohup bash scripts/tail_r4.sh embaug  > runs/tail_r4.log 2>&1 &
#        nohup bash scripts/tail_r4.sh neg20 45 >> runs/tail_r4.log 2>&1 &
set -x
cd /root/repo

PRER=/root/repo/data/prerendered_r4
LOCK=/root/repo/runs/.chip_busy
trap 'rm -f "$LOCK"' EXIT

locked () {
  touch "$LOCK"
  "$@"
  local rc=$?
  rm -f "$LOCK"
  return $rc
}

train_once () {  # config run_dir timeout_s — single attempt, no retry
  # (the tail window has no room for the 30-min recovery idle; if the
  # chip wedges we stop and leave it idle for the driver bench)
  touch "$LOCK"
  timeout "${3:-4200}" python -m lookoncetohear_tpu.trainer \
    --config "$1" --run_dir "$2" --prerender "$PRER/shared" --resume
  local rc=$?
  rm -f "$LOCK"
  return $rc
}

MODE="${1:-embaug}"

if [ "$MODE" = "embaug" ]; then
  train_once configs/tsh_synthetic_embaug.json runs/tsh_r4_embaug 4200 \
    || { echo "embaug train failed"; exit 1; }
  echo "embaug train done"
  locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
    --config configs/tsh_synthetic_embaug.json --run_dir runs/tsh_r4_embaug \
    --enroll_config '' --enroll_run_dir ''
  echo "embaug oracle eval rc=$?"
  locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
    --config configs/tsh_synthetic_embaug.json --run_dir runs/tsh_r4_embaug \
    --enroll_config configs/embed_synthetic.json \
    --enroll_run_dir runs/embed_r4_ref
  echo "embaug two-stage eval rc=$?"
elif [ "$MODE" = "neg20" ]; then
  EPOCHS="${2:-60}"
  python - "$EPOCHS" <<'EOF'
import json, sys
c = json.load(open('configs/embed_synthetic_neg20.json'))
c['epochs'] = int(sys.argv[1])
json.dump(c, open('runs/embed_synthetic_neg20_tail.json', 'w'), indent=4)
EOF
  train_once runs/embed_synthetic_neg20_tail.json runs/embed_r4_neg20 5400 \
    || { echo "neg20 train failed"; exit 1; }
  echo "neg20 train done"
  locked timeout 1800 python -m lookoncetohear_tpu.ts_hear_test \
    --config configs/tsh_synthetic.json --run_dir runs/tsh_r4 \
    --enroll_config configs/embed_synthetic_neg20.json \
    --enroll_run_dir runs/embed_r4_neg20
  echo "neg20 two-stage eval rc=$?"
else
  echo "unknown mode $MODE"; exit 2
fi

echo "TAIL DONE ($MODE)"
