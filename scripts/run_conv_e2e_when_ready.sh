#!/bin/bash
# Waits for the CPU queue's torch seed-0 artifacts, then runs the
# converted-checkpoint end-to-end generation (scripts/converted_e2e.py,
# CPU — never touches the TPU the arm queue owns) and touches conv.done.
#
# Gates on the ACTUAL checkpoint files, not just the marker: a restored
# session can have the harvested torch_gen0.done marker without the
# (unharvested) resume checkpoints — only the *_final.pth artifacts are
# durable. Retries the generation a few times: on the loaded 1-core host
# a transient failure must not permanently lose the convtorch arm.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
M=/root/repo/experiments
mkdir -p "$M"
LOG=$M/conv_e2e.log
exec >> "$LOG" 2>&1

[ -f $M/conv.done ] && exit 0
echo "=== $(date +%T) waiting for torch seed-0 checkpoints ==="
have_ckpts () {
  local k
  for k in pred ref; do
    [ -f $M/parity_full/torch_${k}_600_final.pth ] \
      || [ -f $M/parity_full/torch_${k}_600.pth ] || return 1
  done
  return 0
}
while ! { [ -f $M/torch_gen0.done ] && have_ckpts; }; do sleep 60; done
for attempt in 1 2 3; do
  echo "=== $(date +%T) converted e2e (CPU), attempt $attempt ==="
  python scripts/converted_e2e.py && { touch $M/conv.done; exit 0; }
  echo "=== converted e2e attempt $attempt FAILED ==="
  sleep 300
done
echo "=== converted e2e exhausted retries ==="
exit 1
