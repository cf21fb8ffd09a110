#!/bin/bash
# Round-3 FGD-parity ablation: isolate the two documented training
# deviations (context-mask bank, exact-count token curriculum) and run the
# reference-exact configuration at two seeds. Serialized: one process owns
# the TPU at a time. Resumable: each stage checkpoints.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/experiments/parity_full/ablation_r3.log
exec >> "$LOG" 2>&1

for v in ctx topk exact; do
  echo "=== $(date +%T) variant $v seed 0 ==="
  PARITY_VARIANT=$v PARITY_JAX_SEED=0 python scripts/parity_full_campaign.py jax
done
echo "=== $(date +%T) variant exact seed 1 ==="
PARITY_VARIANT=exact PARITY_JAX_SEED=1 python scripts/parity_full_campaign.py jax
echo "=== $(date +%T) variant legacy seed 1 (noise band for round-2 config) ==="
PARITY_VARIANT=legacy PARITY_JAX_SEED=1 python scripts/parity_full_campaign.py jax
echo "=== $(date +%T) scoring ==="
python scripts/parity_full_campaign.py score
echo "=== $(date +%T) ablation done ==="
