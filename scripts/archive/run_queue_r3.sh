#!/bin/bash
# Round-3 TPU work queue: waits for the ablation daemon to release the TPU,
# then runs the flash-attention bench and the 50k-step long campaign.
# Safe to restart: every stage is resumable.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/experiments/queue_r3.log
exec >> "$LOG" 2>&1

ABL=/root/repo/experiments/parity_full/ablation_r3.log
while ! grep -q "ablation done" "$ABL" 2>/dev/null; do
  sleep 60
done
echo "=== $(date +%T) ablation finished; running flash bench ==="
python scripts/bench_flash.py
echo "=== $(date +%T) flash bench done; starting long campaign ==="
python scripts/long_campaign.py
echo "=== $(date +%T) queue r3 done ==="
