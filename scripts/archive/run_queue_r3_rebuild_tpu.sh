#!/bin/bash
# Round-3 rebuild, TPU queue: one process owns the TPU at a time, so every
# TPU stage is serialized here. Stage-resumable; run under tmux.
#   1. demo campaign  -> experiments/demo_ckpt (shared FGD embedder trio)
#                        + EVAL_DEMO.json
#   2. jax ablation arms (incl. the new init/faithinit/opt/faith arms)
#   3. score (waits for the CPU queue's torch generations)
#   4. 50k-step long campaign -> LONG_CAMPAIGN.json
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p experiments
LOG=/root/repo/experiments/queue_tpu.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) demo campaign (embedder trio + EVAL_DEMO) ==="
python scripts/train_demo_campaign.py

for vs in legacy:0 legacy:1 ctx:0 topk:0 exact:0 exact:1 \
          faith:0 faith:1 opt:0 init:0 init:1 faithinit:0 faithinit:1; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v seed $s ==="
  PARITY_VARIANT=$v PARITY_JAX_SEED=$s python scripts/parity_full_campaign.py jax
done

echo "=== $(date +%T) waiting for torch generations ==="
while [ ! -f /root/repo/experiments/cpu_queue.done ]; do sleep 60; done
echo "=== $(date +%T) scoring all arms ==="
python scripts/parity_full_campaign.py score

echo "=== $(date +%T) long campaign (50k steps) ==="
python scripts/long_campaign.py
touch /root/repo/experiments/tpu_queue.done
echo "=== $(date +%T) tpu queue done ==="
