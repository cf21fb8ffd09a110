#!/bin/bash
# Round-4 TPU queue. Waits for the shared data cache, then: demo campaign
# (rebuilds the shared FGD embedder trio + EVAL_DEMO.json — harvest the
# trio IMMEDIATELY so scores stay pinned across future rounds), then the
# parity arms with the decisive ones first at 3 seeds (VERDICT r3 #3),
# slotting the shared-torch-VQ causal arms and incremental scoring in as
# soon as the CPU queue's markers appear. The 50k long campaign fills the
# tail while the slow CPU side finishes. Stage-resumable; one process
# owns the TPU.
#
# ADVICE r3 fixes: markers only on success; the FINAL score + scored.done
# wait for cpu_queue.done (not just torch_gen0.done) so the _s1 arm can
# never be half-read or silently missing from PARITY_FGD.json.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p experiments
M=/root/repo/experiments
LOG=$M/queue_tpu.log
exec >> "$LOG" 2>&1

echo "=== $(date +%T) waiting for the data cache ==="
while [ ! -f $M/cache.done ]; do sleep 15; done

if [ ! -f $M/trio.done ]; then
  echo "=== $(date +%T) demo campaign (embedder trio + EVAL_DEMO) ==="
  python scripts/train_demo_campaign.py \
    && touch $M/trio.done || { echo "=== demo campaign FAILED ==="; exit 1; }
fi

run_arm () {  # run_arm <variant> <seed> [vq-src]
  local v=$1 s=$2 src=${3:-jax}
  echo "=== $(date +%T) jax arm $v seed $s vq=$src ==="
  PARITY_VQ_SRC=$src PARITY_VARIANT=$v PARITY_JAX_SEED=$s \
    python scripts/parity_full_campaign.py jax \
    || { echo "=== arm $v s$s ($src) FAILED ==="; exit 1; }
}

maybe_tvq () {  # causal shared-torch-VQ arms, once the torch VQ exists
  if [ -f $M/torch_vq.done ] && [ ! -f $M/tvq.done ]; then
    run_arm faithinit 0 torch
    run_arm legacy 0 torch
    run_arm faithinit 1 torch
    touch $M/tvq.done
  fi
}

maybe_score () {  # incremental scoring, once seed-0 torch generations exist
  if [ -f $M/torch_gen0.done ]; then
    echo "=== $(date +%T) scoring available arms ==="
    python scripts/parity_full_campaign.py score || true
  fi
}

# Decisive arms first: the faithful-everything and round-2-legacy configs
# at 3 seeds each (error bars, VERDICT r3 #3), then the single-factor
# ablations at seed 0.
for vs in faithinit:0 legacy:0 faithinit:1 legacy:1 faithinit:2 legacy:2 \
          faith:0 opt:0 init:0 ctx:0 topk:0 exact:0; do
  maybe_tvq
  v=${vs%:*}; s=${vs#*:}
  run_arm "$v" "$s"
  maybe_score
done

echo "=== $(date +%T) waiting for torch VQ, then causal arms ==="
while [ ! -f $M/torch_vq.done ]; do sleep 30; done
maybe_tvq

# Fill the tail with the 50k long campaign while the CPU side finishes;
# it is step-resumable, so a session end mid-run loses nothing.
while [ ! -f $M/cpu_queue.done ]; do
  if [ ! -f $M/long.done ]; then
    echo "=== $(date +%T) long campaign (50k steps) ==="
    python scripts/long_campaign.py && touch $M/long.done || sleep 60
  else
    sleep 30
  fi
  maybe_score
done

echo "=== $(date +%T) final score over ALL arms (cpu queue complete) ==="
python scripts/parity_full_campaign.py score \
  && touch $M/scored.done || { echo "=== final score FAILED ==="; exit 1; }
touch $M/tpu_queue.done
echo "=== $(date +%T) tpu queue done ==="

if [ ! -f $M/long.done ]; then
  echo "=== $(date +%T) long campaign (50k steps, post-queue) ==="
  python scripts/long_campaign.py && touch $M/long.done
fi
