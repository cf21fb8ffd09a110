#!/bin/bash
# Round-3 session-6 TPU queue. Waits for the shared data cache, then:
# demo campaign (rebuilds the shared FGD embedder trio + EVAL_DEMO.json),
# headline jax parity arms, the 50k long campaign (TPU-only — never blocks
# on the slow 1-core torch side), then the remaining arms, slotting the
# shared-torch-VQ causal arms and scoring in as soon as the CPU queue's
# markers appear. Stage-resumable throughout; one process owns the TPU.
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

run_arm () {  # run_arm <variant> <seed> [tvq]
  local v=$1 s=$2 src=${3:-jax}
  echo "=== $(date +%T) jax arm $v seed $s vq=$src ==="
  PARITY_VQ_SRC=$src PARITY_VARIANT=$v PARITY_JAX_SEED=$s \
    python scripts/parity_full_campaign.py jax
}

maybe_tvq () {  # causal shared-torch-VQ arms, once the torch VQ exists
  if [ -f /root/repo/experiments/torch_vq.done ] && \
     [ ! -f /root/repo/experiments/tvq.done ]; then
    run_arm faithinit 0 torch
    run_arm legacy 0 torch
    touch /root/repo/experiments/tvq.done
  fi
}

maybe_score () {  # incremental scoring, once torch generations exist
  if [ -f /root/repo/experiments/torch_gen0.done ]; then
    echo "=== $(date +%T) scoring available arms ==="
    python scripts/parity_full_campaign.py score
  fi
}

# Headline arms first: fully-faithful and round-2-legacy, seed 0.
run_arm faithinit 0
run_arm legacy 0

# Long campaign early: it is the other judge headline and needs no torch
# artifacts (50k steps, step-resumable, ~10 ms/step device time).
echo "=== $(date +%T) long campaign (50k steps) ==="
python scripts/long_campaign.py
touch /root/repo/experiments/long.done

# Remaining arms; slot in tvq arms + scoring whenever the CPU side lands.
for vs in faithinit:1 legacy:1 faith:0 opt:0 init:0 ctx:0 topk:0 exact:0; do
  maybe_tvq
  v=${vs%:*}; s=${vs#*:}
  run_arm "$v" "$s"
  maybe_score
done

echo "=== $(date +%T) waiting for torch VQ, then causal arms ==="
while [ ! -f /root/repo/experiments/torch_vq.done ]; do sleep 30; done
maybe_tvq

echo "=== $(date +%T) waiting for torch generations (seed 0) ==="
while [ ! -f /root/repo/experiments/torch_gen0.done ]; do sleep 30; done
python scripts/parity_full_campaign.py score
touch /root/repo/experiments/scored.done
touch /root/repo/experiments/tpu_queue.done
echo "=== $(date +%T) tpu queue done ==="
