#!/bin/bash
# Round-3 follower, TPU queue: runs AFTER run_queue_r3_rebuild_tpu.sh
# (waits on its completion marker — one process owns the TPU).
#
# Shared-VQ ablation arms (PARITY_VQ_SRC=torch): the jax predictor +
# refiner train against the CONVERTED torch VQ, so both systems predict
# identical code targets and decode through identical codebooks. The
# code-entropy audit (CODE_ENTROPY.json) showed the jax VQ's richer
# codebook usage (perplexity 52 vs 42; unigram CE floor +0.79 nats)
# tracks the campaign CE gap — these arms test that causally:
#   faithinit-tvq: everything matched (curricula+opt+init+VQ) x 2 seeds
#   legacy-tvq:    round-2 jax config on the shared VQ x 2 seeds
# Then rescore all arms into PARITY_FGD.json.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/experiments/queue_tpu_r3c.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) waiting for the rebuild TPU queue ==="
while [ ! -f /root/repo/experiments/tpu_queue.done ]; do sleep 60; done

for vs in faithinit:0 faithinit:1 legacy:0 legacy:1; do
  v=${vs%:*}; s=${vs#*:}
  echo "=== $(date +%T) jax arm $v-tvq seed $s ==="
  PARITY_VQ_SRC=torch PARITY_VARIANT=$v PARITY_JAX_SEED=$s \
    python scripts/parity_full_campaign.py jax
done

echo "=== $(date +%T) rescoring all arms ==="
python scripts/parity_full_campaign.py score
touch /root/repo/experiments/tpu_queue_r3c.done
echo "=== $(date +%T) r3c tpu queue done ==="
