#!/bin/bash
# Round-3 rebuild, TPU queue (session-5 full restart): experiments/ was
# wiped again between sessions, so this consolidates run_queue_r3_rebuild_tpu.sh
# (demo campaign first — the shared FGD embedder trio must exist before any
# scoring) with the tpu2 ordering (new-evidence arms first) and the
# shared-torch-VQ causal arms. Stage-resumable; one process owns the TPU;
# run under tmux.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p experiments
LOG=/root/repo/experiments/queue_tpu.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) demo campaign (embedder trio + EVAL_DEMO) ==="
python scripts/train_demo_campaign.py

for vs in faith:0 faith:1 opt:0 init:0 init:1 faithinit:0 faithinit:1 \
          legacy:0 legacy:1 ctx:0 topk:0 exact:0 exact:1; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v seed $s ==="
  PARITY_VARIANT=$v PARITY_JAX_SEED=$s python scripts/parity_full_campaign.py jax
done

echo "=== $(date +%T) waiting for the finished torch VQ (cpu queue stage 1) ==="
while ! grep -q "torch predictor+refiner+gen, seed 0" \
        /root/repo/experiments/queue_cpu.log; do sleep 60; done

for vs in faithinit:0 faithinit:1 legacy:0 legacy:1; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v-tvq seed $s (shared torch VQ) ==="
  PARITY_VQ_SRC=torch PARITY_VARIANT=$v PARITY_JAX_SEED=$s \
    python scripts/parity_full_campaign.py jax
done

echo "=== $(date +%T) waiting for torch generations (cpu queue done) ==="
while [ ! -f /root/repo/experiments/cpu_queue.done ]; do sleep 60; done
echo "=== $(date +%T) scoring all arms ==="
python scripts/parity_full_campaign.py score

echo "=== $(date +%T) long campaign (50k steps) ==="
python scripts/long_campaign.py
touch /root/repo/experiments/tpu_queue.done
echo "=== $(date +%T) tpu queue done ==="
