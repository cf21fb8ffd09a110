#!/bin/bash
# Round-3 queue, phase B: after the flash bench frees the TPU, run the
# optimizer ablation arms (faith = curricula+optimizer fully faithful to
# the running torch reference; opt = optimizer isolated), re-score, then
# start the 50k-step long campaign. Resumable at every stage.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/experiments/queue_r3b.log
exec >> "$LOG" 2>&1

while [ -n "$(ps -p "$1" -o pid= 2>/dev/null)" ]; do
  sleep 30
done
ABL=/root/repo/experiments/parity_full/ablation_r3.log
{
  echo "=== $(date +%T) phase B: optimizer ablation ==="
  for s in 0 1; do
    echo "=== $(date +%T) variant faith seed $s ==="
    PARITY_VARIANT=faith PARITY_JAX_SEED=$s python scripts/parity_full_campaign.py jax
  done
  echo "=== $(date +%T) variant opt seed 0 ==="
  PARITY_VARIANT=opt PARITY_JAX_SEED=0 python scripts/parity_full_campaign.py jax
  echo "=== $(date +%T) scoring ==="
  python scripts/parity_full_campaign.py score
  echo "=== $(date +%T) ablation B done ==="
} >> "$ABL" 2>&1
echo "=== $(date +%T) starting long campaign ==="
python scripts/long_campaign.py
echo "=== $(date +%T) queue r3b done ==="
