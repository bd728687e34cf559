#!/bin/bash
# Watch for the wedged proxied v5e to recover, then run the round-4
# chain exactly once. Probe cadence per the recovery protocol: one
# 3-min-bounded probe every 45 min of otherwise-zero traffic.
cd /root/repo
for i in $(seq 1 20); do
  if timeout 180 env -u JAX_PLATFORMS python scripts/chip_probe.py \
      >> runs/chip_watch.log 2>&1; then
    echo "$(date -u +%FT%TZ) probe OK (attempt $i) -> launching chain" \
      >> runs/chip_watch.log
    bash scripts/chain_r4.sh > runs/chain_r4.log 2>&1
    echo "$(date -u +%FT%TZ) chain exited rc=$?" >> runs/chip_watch.log
    exit 0
  fi
  echo "$(date -u +%FT%TZ) probe $i failed/hung; sleeping 2700s" \
    >> runs/chip_watch.log
  sleep 2700
done
echo "$(date -u +%FT%TZ) gave up after 20 probes" >> runs/chip_watch.log
exit 1
