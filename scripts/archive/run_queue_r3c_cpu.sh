#!/bin/bash
# Round-3 follower, CPU queue: a THIRD torch seed (_s2) for the torch
# noise band (PARITY.md: seed-to-seed variance at 600 steps is the key
# context for single-run FGD comparisons). Waits for the rebuild CPU
# queue, never touches the TPU.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PROBTALK_FORCE_CPU=1
export PYTHONHASHSEED=0
LOG=/root/repo/experiments/queue_cpu_r3c.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) waiting for the rebuild CPU queue ==="
while [ ! -f /root/repo/experiments/cpu_queue.done ]; do sleep 60; done

echo "=== $(date +%T) torch predictor+refiner+gen, seed tag _s2 ==="
PARITY_TORCH_TAG=_s2 python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch
touch /root/repo/experiments/cpu_queue_r3c.done
echo "=== $(date +%T) r3c cpu queue done ==="
