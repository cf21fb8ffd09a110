#!/bin/bash
# Round-3 rebuild, CPU queue (torch reference side only — never touches the
# TPU): experiments/ was wiped between sessions, so every parity artifact
# is retrained from its seeds. Stage-resumable; run under tmux.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PROBTALK_FORCE_CPU=1
export PYTHONHASHSEED=0
mkdir -p experiments
LOG=/root/repo/experiments/queue_cpu.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) torch VQ 1500 (parity_campaign) ==="
PARITY_STEPS=1500 python scripts/parity_campaign.py torch
echo "=== $(date +%T) torch predictor+refiner+gen, seed 0 ==="
python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch
echo "=== $(date +%T) torch predictor+refiner+gen, seed tag _s1 ==="
PARITY_TORCH_TAG=_s1 python scripts/parity_full_campaign.py torch_pred torch_ref gen_torch
touch /root/repo/experiments/cpu_queue.done
echo "=== $(date +%T) cpu queue done ==="
