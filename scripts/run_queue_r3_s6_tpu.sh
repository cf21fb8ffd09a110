#!/bin/bash
# Round-3 session-6 TPU queue. Waits for the shared data cache, then:
# demo campaign (rebuilds the shared FGD embedder trio + EVAL_DEMO.json),
# jax parity arms in judge-priority order (the headline faithinit/legacy
# pairs first), shared-torch-VQ causal arms as soon as the CPU queue's
# torch VQ lands, scoring as soon as torch generations land, then the 50k
# long campaign. Stage-resumable throughout; one process owns the TPU.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p experiments
LOG=/root/repo/experiments/queue_tpu.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) waiting for the data cache ==="
while [ ! -f /root/repo/experiments/cache.done ]; do sleep 15; done

echo "=== $(date +%T) demo campaign (embedder trio + EVAL_DEMO) ==="
python scripts/train_demo_campaign.py
touch /root/repo/experiments/trio.done

# Headline arms first: fully-faithful and round-2-legacy, seed 0.
for vs in faithinit:0 legacy:0; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v seed $s ==="
  PARITY_VARIANT=$v PARITY_JAX_SEED=$s python scripts/parity_full_campaign.py jax
done

# Causal shared-torch-VQ arms the moment the torch VQ exists (tests the
# CODE_ENTROPY.json confound: identical code targets + codebooks).
echo "=== $(date +%T) waiting for the torch VQ ==="
while [ ! -f /root/repo/experiments/torch_vq.done ]; do sleep 30; done
for vs in faithinit:0 legacy:0; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v-tvq seed $s (shared torch VQ) ==="
  PARITY_VQ_SRC=torch PARITY_VARIANT=$v PARITY_JAX_SEED=$s \
    python scripts/parity_full_campaign.py jax
done

# Second seeds + single-factor arms.
for vs in faithinit:1 legacy:1 faith:0 opt:0 init:0 ctx:0 topk:0 exact:0; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v seed $s ==="
  PARITY_VARIANT=$v PARITY_JAX_SEED=$s python scripts/parity_full_campaign.py jax
  # score incrementally once torch generations exist, so PARITY_FGD.json
  # is always as complete as the artifacts allow
  if [ -f /root/repo/experiments/torch_gen0.done ]; then
    python scripts/parity_full_campaign.py score
  fi
done

echo "=== $(date +%T) waiting for torch generations (seed 0) ==="
while [ ! -f /root/repo/experiments/torch_gen0.done ]; do sleep 30; done
echo "=== $(date +%T) scoring all arms ==="
python scripts/parity_full_campaign.py score
touch /root/repo/experiments/scored.done

echo "=== $(date +%T) long campaign (50k steps) ==="
python scripts/long_campaign.py
touch /root/repo/experiments/tpu_queue.done
echo "=== $(date +%T) tpu queue done ==="
