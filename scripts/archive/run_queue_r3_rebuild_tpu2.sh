#!/bin/bash
# Round-3 rebuild, TPU queue (tail restart, consolidated): the demo-campaign
# stage of run_queue_r3_rebuild_tpu.sh finished (EVAL_DEMO.json written), so
# this relaunch starts at the jax ablation arms — NEW-evidence arms first
# (faith/opt/init/faithinit are claimed in PARITY.md but had no JSON rows),
# then the arms with previously-committed rows (must be regenerated anyway:
# the rescore trio is freshly trained, so every row has to come from the
# same embedders), then the shared-VQ causal arms (folded in from
# run_queue_r3c_tpu.sh, gated on the torch VQ finishing on the CPU queue),
# then the 50k long campaign. Scoring runs separately once torch
# generations land. Stage-resumable; one process owns the TPU.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p experiments
LOG=/root/repo/experiments/queue_tpu.log
exec >> "$LOG" 2>&1

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

echo "=== $(date +%T) long campaign (50k steps) ==="
python scripts/long_campaign.py
touch /root/repo/experiments/tpu_queue.done
echo "=== $(date +%T) tpu queue done ==="
